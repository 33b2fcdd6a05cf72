package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene, the STRICT engine-portable tier — the sibling of
  * [[graft.functions.UrlFunctions]] and deliberately not a duplicate:
  * UrlFunctions is the `parse_url`-native fast path (java.net.URI
  * semantics, q65-q67's gates) whose parser cannot be replayed
  * outside Spark; THIS module re-derives every component from RE2-safe
  * regexes — the q57 PII discipline — so the SAME pattern text runs on
  * any engine, and layers the normalizations the fast path stops short
  * of: userinfo strip, default-port strip (:80 http / :443 https), a
  * multi-part registrable-domain heuristic (bbc.co.uk → bbc.co.uk, not
  * co.uk), and a full canonical dedup key. UrlConsistencySpec locks
  * the two modules to agree on clean inputs.
  *
  * The component extractors are pure `Column` expressions (codegen'd,
  * map-only, any scale) whose pattern text replays on any RE2 engine
  * (patterns avoid backtracking-only syntax, and the trailing-slash
  * strip is anchored to true end-of-input so Java and RE2 agree on
  * line-terminator inputs too). [[urlNormalize]] itself routes to the
  * fused Spark kernel [[graft.functions.UrlKernels.normalize]];
  * [[urlNormalizeDeclarative]] is the engine-portable executable spec
  * it is locked to. No public-suffix list ships offline, so registrable-domain
  * uses the documented heuristic: last two host labels, or last three
  * when the second-to-last is a well-known multi-part suffix (co/com/
  * net/org/gov/ac/edu + 2-letter ccTLD) — right for the overwhelming
  * bulk of a crawl and loudly simple, not silently wrong.
  */
object Web {

  /** Lowercased scheme, or null when the value does not look like a
    * scheme://-style URL at all. */
  def urlScheme(u: Column): Column =
    lower(nullIfEmpty(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))

  /** Lowercased host (authority minus userinfo/port). IPv6 bracket
    * literals come back WITH their brackets (`http://[::1]:8080/` →
    * `[::1]` — the java.net.URI convention), via a dedicated
    * alternation branch: the ':' inside the brackets would otherwise
    * truncate the generic host pattern. */
  def urlHost(u: Column): Column =
    lower(nullIfEmpty(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?" +
        "(\\[[^\\]/?#]*\\]|[^/:?#]+)", 1)))

  /** Explicit port as a long, null when absent (IPv6 bracket literals
    * handled — the port is the digits after the ']'). try_cast, not
    * cast: a matched digit run longer than a BIGINT (>19 digits) must
    * yield a NULL port on ANY Spark — under the ANSI default a plain
    * cast would throw, silently diverging from the fused kernel and
    * from DuckDB's overflow behavior on such (data-error) inputs. */
  def urlPort(u: Column): Column =
    nullIfEmpty(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?" +
        "(?:\\[[^\\]/?#]*\\]|[^/:?#]+):([0-9]+)", 1))
      .try_cast("long")

  /** Path component ('' when absent — the pre-?# slash run). */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Query string WITHOUT the '?', null when absent. */
  def urlQuery(u: Column): Column =
    nullIfEmpty(regexp_extract(u, "\\?([^#]*)", 1))

  /** Registrable domain by the documented offline heuristic: last two
    * labels, or last three when label -2 is a well-known multi-part
    * second-level (co|com|net|org|gov|ac|edu) AND the TLD is a
    * 2-letter ccTLD. */
  def registrableDomain(host: Column): Column = {
    val three = regexp_extract(host,
      "([^.]+\\.(?:co|com|net|org|gov|ac|edu)\\.[A-Za-z]{2})$", 1)
    val two = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    nullIfEmpty(when(three =!= "", three).otherwise(two))
  }

  /** Canonical dedup key: lowercase scheme+host, strip userinfo,
    * default ports (:80 http, :443 https), fragment, and tracking
    * params (utm_*, gclid, fbclid, msclkid, mc_cid, mc_eid), sort the
    * surviving query params bytewise, drop a bare trailing '/' on
    * non-root paths and a trailing '?' — one deterministic string both
    * engines assemble from the same parts.
    *
    * Optimization r10 (guide §1.2): computed by the fused one-byte-walk
    * kernel [[graft.functions.UrlKernels.normalize]] instead of the
    * seven-regex Column composition. The composition stays below as
    * [[urlNormalizeDeclarative]] — it IS the semantics (the same
    * pattern text runs on any engine, which is how the oracle replays
    * it), and `UrlNormFusedSpec` locks the fused kernel to it
    * bit-for-bit, backtracking quirks included. */
  def urlNormalize(u: Column): Column = graft.functions.url_normalize(u)

  /** The original RE2-safe Column composition of [[urlNormalize]] —
    * kept as the executable spec of the normalization (oracle parity +
    * the fused kernel's cross-check reference). Not the hot path. */
  def urlNormalizeDeclarative(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = urlPort(u)
    val rawPath = urlPath(u)
    // \z (true end-of-input), not $: Java's $ also matches BEFORE a
    // final line terminator, so 'http://h/p/\n' would strip to '/p\n'
    // under $ while RE2 engines (the oracle) and the fused kernel keep
    // '/p/\n' — \z pins all three to end-of-text semantics.
    val path = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+\\z", ""))
    val pathOrRoot = when(path === "", lit("/")).otherwise(path)
    // the (=.*)? tail also strips BARE tracking params ('?gclid' with
    // no value) — otherwise two otherwise-identical URLs dedup apart
    val keptParams = filter(
      split(coalesce(urlQuery(u), lit("")), "&"),
      p => !(p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|" +
        "mc_cid|mc_eid)(=.*)?$") || p === ""))
    val query = array_join(array_sort(keptParams), "&")
    val portPart = when(port.isNull, lit(""))
      .when(scheme === "http" && port === 80L, lit(""))
      .when(scheme === "https" && port === 443L, lit(""))
      .otherwise(concat(lit(":"), port.cast("string")))
    when(scheme.isNull || host.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, pathOrRoot,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  private def nullIfEmpty(c: Column): Column =
    when(c === "", lit(null).cast("string")).otherwise(c)
}
