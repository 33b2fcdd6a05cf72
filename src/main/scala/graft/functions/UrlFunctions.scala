package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-scale training pipelines: host / registered-domain
  * extraction, parameter stripping, and full canonicalization — the
  * normalize-before-dedup step every web corpus (C4, RefinedWeb, FineWeb)
  * applies before URL-level dedup and domain blocklists.
  *
  * The reference stores URIs as plain strings (docarray/document/mixins/
  * content.py `uri` property; sugar/io/file.py validates but never
  * normalizes), so equality there is raw-string equality; at 100 TB the
  * canonical form IS the dedup key, so it has to be a first-class column
  * transform.
  *
  * Everything here composes native, codegen'd expressions — `parse_url`
  * (Spark's java.net.URI-backed extractor), `split`/`filter`/`sort_array`
  * for the query string — no UDFs, so the whole thing stays inside one
  * WholeStageCodegen span and pushes through the scan like any projection.
  */
object UrlFunctions {

  /** Lowercased scheme, e.g. "https". */
  def urlScheme(url: Column): Column = lower(parse_url(url, lit("PROTOCOL")))

  /** Lowercased hostname, port excluded. */
  def urlHost(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Explicit port as a string, "" when absent ("443" from ":443"). */
  def urlPort(url: Column): Column =
    coalesce(regexp_extract(parse_url(url, lit("AUTHORITY")), ":([0-9]+)$", 1),
      lit(""))

  /** Last two dot-labels of the host — the eTLD+1 under the single-label
    * public-suffix assumption (a real PSL table is a broadcast-join away;
    * this matches the common-crawl-style heuristic). */
  def urlRegisteredDomain(url: Column): Column =
    substring_index(urlHost(url), ".", -2)

  /** Path with any trailing slash removed (root "/" collapses to ""). */
  def urlPathNorm(url: Column): Column = {
    val p = coalesce(parse_url(url, lit("PATH")), lit(""))
    regexp_replace(p, "/+$", "")
  }

  /** Number of non-empty path segments. */
  def urlPathDepth(url: Column): Column =
    size(filter(split(coalesce(parse_url(url, lit("PATH")), lit("")), "/"),
      s => s =!= ""))

  /** Query string with tracking params dropped and the rest sorted
    * byte-wise; "" when nothing survives. `dropPrefixes` filters by
    * key prefix (the utm_* family by default). */
  def urlQueryNorm(url: Column,
      dropPrefixes: Seq[String] = Seq("utm_")): Column = {
    val q = coalesce(parse_url(url, lit("QUERY")), lit(""))
    val kept = filter(split(q, "&"), p => {
      val nonEmpty = p =!= ""
      dropPrefixes.foldLeft(nonEmpty)((acc, pre) =>
        acc && !p.startsWith(pre))
    })
    array_join(sort_array(kept), "&")
  }

  /** Full canonical form: lowercase scheme+host, default ports dropped
    * (80/http, 443/https), trailing-slash-free path, tracking-free sorted
    * query, fragment dropped. Two URLs naming the same resource map to
    * one string — the URL-dedup key. */
  def urlCanonicalize(url: Column,
      dropPrefixes: Seq[String] = Seq("utm_")): Column = {
    val scheme = urlScheme(url)
    val host = urlHost(url)
    val port = urlPort(url)
    val keepPort = when(port === "", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .otherwise(concat(lit(":"), port))
    val qs = urlQueryNorm(url, dropPrefixes)
    concat(scheme, lit("://"), host, keepPort, urlPathNorm(url),
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }
}
