package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass kernel behind [[UrlNormalize]].
  *
  * Why this exists (optimization round 10, guide §1.2 "per-task work"):
  * `Web.urlNormalize` composed SEVEN full-string regex passes per row
  * (scheme, host, port, path extracts — each re-deriving the
  * scheme/userinfo prefix — plus the query extract, a trailing-slash
  * regexp_replace and one rlike per query param). The components' regex
  * grammar is simple enough to parse in one byte walk; only the
  * tracking-param test keeps its (tiny, per-param) compiled regex so its
  * exact `rlike` semantics are preserved by construction.
  *
  * EXACT-EQUIVALENCE CONTRACT: this kernel must return, for every input,
  * exactly what the declarative composition
  * [[graft.operators.Web.urlNormalizeDeclarative]] returns — including
  * Java-regex backtracking quirks, which are replicated deliberately:
  *
  *  - host alternation order `(\[…\]|[^/:?#]+)` with the optional greedy
  *    userinfo group: try (userinfo, bracket), (userinfo, run),
  *    (no-userinfo, bracket), (no-userinfo, run); first nonempty match
  *    wins. The no-userinfo run CAN contain '@' (the `http://x@/` case,
  *    where stripping the userinfo would leave an empty host and the
  *    regex backtracks to host `x@`).
  *  - the PORT regex re-derives the prefix with its own backtracking, so
  *    `http://a:1@b/` yields host `b` (userinfo stripped) but port `1`
  *    (from the backtracked no-userinfo parse `a:1`) — replicated by
  *    running the same variant loop with the `:[0-9]+` continuation.
  *  - the query is the FIRST `\?([^#]*)` match anywhere in the string
  *    (the pattern is unanchored), so a '?' after '#' still yields a
  *    query.
  *  - port digits cast like `try_cast(.. as long)` (the declarative
  *    composition uses try_cast so ANSI mode cannot throw): a
  *    matched-but-overflowing digit run gives a NULL port (which the
  *    normalizer then renders as no port at all).
  *  - the trailing-slash collapse strips '/' runs at TRUE end-of-input
  *    only (the declarative regexp_replace is anchored with \z, and
  *    RE2 oracles' $ already means end-of-text), so a path ending in a
  *    line terminator keeps its inner slashes.
  *
  * `UrlNormFusedSpec` locks the contract with fixed adversarial cases
  * plus a seeded component fuzz cross-checked against the declarative
  * composition.
  */
object UrlKernels {
  /** Same pattern text as the declarative `rlike`, applied with
    * `find()` on the param string — `RLike`'s exact call shape. */
  private val tracking = java.util.regex.Pattern.compile(
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid)(=.*)?$")

  private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isSchemeChar(b: Byte): Boolean =
    isAlpha(b) || (b >= '0' && b <= '9') || b == '+' || b == '.' || b == '-'
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Unsigned-lexicographic compare of two byte slices — exactly
    * `UTF8String.compareTo` (what `array_sort` uses for strings under
    * the default binary collation). */
  private def lessSeg(b: Array[Byte], s1: Int, e1: Int, s2: Int,
      e2: Int): Boolean = {
    val l1 = e1 - s1; val l2 = e2 - s2
    val len = math.min(l1, l2)
    var i = 0
    while (i < len) {
      val x = b(s1 + i) & 0xff; val y = b(s2 + i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    l1 < l2
  }

  def normalize(u: UTF8String): UTF8String = {
    val b = u.getBytes
    val n = b.length
    // ---- scheme: ^([A-Za-z][A-Za-z0-9+.-]*):// -------------------------
    if (n == 0 || !isAlpha(b(0))) return null
    var i = 1
    while (i < n && isSchemeChar(b(i))) i += 1
    // the scheme class cannot contain ':', so the greedy run needs no
    // backtracking: "://" must sit exactly here or the pattern fails
    if (i + 3 > n || b(i) != ':' || b(i + 1) != '/' || b(i + 2) != '/')
      return null
    val schemeEnd = i
    val p = i + 3
    // ---- optional greedy userinfo (?:[^/@?#]*@)? -----------------------
    var j = p
    while (j < n && b(j) != '/' && b(j) != '@' && b(j) != '?' && b(j) != '#')
      j += 1
    val hasUi = j < n && b(j) == '@'
    val uj = j + 1
    // ---- host: (\[[^\]/?#]*\]|[^/:?#]+), variant order as documented --
    var hs = -1; var he = -1
    def tryHost(pos: Int): Boolean = {
      if (pos < n && b(pos) == '[') {
        var q = pos + 1
        while (q < n && b(q) != ']' && b(q) != '/' && b(q) != '?' &&
          b(q) != '#') q += 1
        if (q < n && b(q) == ']') { hs = pos; he = q + 1; return true }
      }
      var q = pos
      while (q < n && b(q) != '/' && b(q) != ':' && b(q) != '?' &&
        b(q) != '#') q += 1
      if (q > pos) { hs = pos; he = q; true } else false
    }
    if (!(hasUi && tryHost(uj)) && !tryHost(p)) return null
    // ---- port: its own regex, its own backtracking ---------------------
    var portNull = true
    var port = 0L
    var done = false
    var vi = 0
    val nVariants = if (hasUi) 2 else 1
    while (vi < nVariants && !done) {
      val pos = if (hasUi && vi == 0) uj else p
      var bracketEnd = -1
      if (pos < n && b(pos) == '[') {
        var q = pos + 1
        while (q < n && b(q) != ']' && b(q) != '/' && b(q) != '?' &&
          b(q) != '#') q += 1
        if (q < n && b(q) == ']') bracketEnd = q + 1
      }
      var ai = 0
      while (ai < 2 && !done) {
        val e =
          if (ai == 0) bracketEnd
          else {
            var q = pos
            while (q < n && b(q) != '/' && b(q) != ':' && b(q) != '?' &&
              b(q) != '#') q += 1
            if (q > pos) q else -1
          }
        if (e > 0 && e + 1 < n && b(e) == ':' && isDigit(b(e + 1))) {
          var dEnd = e + 1
          while (dEnd < n && isDigit(b(dEnd))) dEnd += 1
          done = true
          val len = dEnd - (e + 1)
          if (len <= 19) {
            try {
              port = java.lang.Long.parseLong(
                new String(b, e + 1, len, java.nio.charset.StandardCharsets.US_ASCII))
              portNull = false
            } catch { case _: NumberFormatException => portNull = true }
          } // > 19 digits: regex matched, cast overflows → null port
        }
        ai += 1
      }
      vi += 1
    }
    // ---- path: authority [^/?#]* then ([^?#]*) -------------------------
    var a = p
    while (a < n && b(a) != '/' && b(a) != '?' && b(a) != '#') a += 1
    var pe = a
    while (pe < n && b(pe) != '?' && b(pe) != '#') pe += 1
    // trailing-slash collapse (regexp_replace "/+$" then ""→"/")
    var pend = pe
    while (pend > a && b(pend - 1) == '/') pend -= 1
    // ---- query: FIRST \?([^#]*) anywhere -------------------------------
    var qi = 0
    while (qi < n && b(qi) != '?') qi += 1
    val kept = new java.util.ArrayList[Array[Int]](4)
    if (qi < n) {
      var qe = qi + 1
      while (qe < n && b(qe) != '#') qe += 1
      // split on '&' (limit -1 semantics), drop empties + tracking params
      var s = qi + 1
      var k = s
      while (k <= qe) {
        if (k == qe || b(k) == '&') {
          if (k > s) {
            val param = new String(b, s, k - s,
              java.nio.charset.StandardCharsets.UTF_8)
            if (!tracking.matcher(param).find()) kept.add(Array(s, k))
          }
          s = k + 1
        }
        k += 1
      }
    }
    // bytewise param sort (insertion; param counts are tiny)
    var ki = 1
    while (ki < kept.size) {
      val cur = kept.get(ki)
      var kk = ki - 1
      while (kk >= 0 && lessSeg(b, cur(0), cur(1), kept.get(kk)(0),
        kept.get(kk)(1))) kk -= 1
      if (kk + 1 != ki) {
        kept.remove(ki)
        kept.add(kk + 1, cur)
      }
      ki += 1
    }
    // ---- assemble -------------------------------------------------------
    val schemeLower = new Array[Byte](schemeEnd)
    var si = 0
    while (si < schemeEnd) {
      val c = b(si)
      schemeLower(si) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
      si += 1
    }
    val isHttp = schemeEnd == 4 && schemeLower(0) == 'h' &&
      schemeLower(1) == 't' && schemeLower(2) == 't' && schemeLower(3) == 'p'
    val isHttps = schemeEnd == 5 && schemeLower(0) == 'h' &&
      schemeLower(1) == 't' && schemeLower(2) == 't' &&
      schemeLower(3) == 'p' && schemeLower(4) == 's'
    // host lowercase via UTF8String.toLowerCase — the exact call the
    // `lower` expression makes (Unicode-correct for non-ASCII hosts)
    val hostLower = UTF8String.fromBytes(b, hs, he - hs).toLowerCase.getBytes
    val portStr: Array[Byte] =
      if (portNull || (isHttp && port == 80L) || (isHttps && port == 443L))
        null
      else java.lang.Long.toString(port)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var outLen = schemeEnd + 3 + hostLower.length +
      (if (portStr == null) 0 else 1 + portStr.length) +
      (if (pend > a) pend - a else 1)
    if (!kept.isEmpty) {
      outLen += 1 + kept.size - 1 // '?' plus '&' separators
      var t = 0
      while (t < kept.size) {
        outLen += kept.get(t)(1) - kept.get(t)(0); t += 1
      }
    }
    val out = new Array[Byte](outLen)
    var o = 0
    System.arraycopy(schemeLower, 0, out, o, schemeEnd); o += schemeEnd
    out(o) = ':'; out(o + 1) = '/'; out(o + 2) = '/'; o += 3
    System.arraycopy(hostLower, 0, out, o, hostLower.length)
    o += hostLower.length
    if (portStr != null) {
      out(o) = ':'; o += 1
      System.arraycopy(portStr, 0, out, o, portStr.length); o += portStr.length
    }
    if (pend > a) {
      System.arraycopy(b, a, out, o, pend - a); o += pend - a
    } else { out(o) = '/'; o += 1 }
    if (!kept.isEmpty) {
      out(o) = '?'; o += 1
      var t = 0
      while (t < kept.size) {
        if (t > 0) { out(o) = '&'; o += 1 }
        val seg = kept.get(t)
        System.arraycopy(b, seg(0), out, o, seg(1) - seg(0))
        o += seg(1) - seg(0)
        t += 1
      }
    }
    UTF8String.fromBytes(out)
  }
}

/** url_normalize(url) → string: the canonical dedup key of
  * [[graft.operators.Web.urlNormalize]] in one compiled byte walk —
  * same output, one pass instead of seven regex extracts. Null for
  * non-URL inputs, exactly like the declarative composition. */
case class UrlNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    UrlKernels.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.UrlKernels.normalize($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
