package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fuzzy string-similarity primitives for entity resolution / record
  * linkage (the dirty-name → canonical-name matching step of a data
  * pipeline). Semantics are pinned to the common reference
  * implementation family (and verified against DuckDB's
  * `jaro_winkler_similarity` probe-by-probe) so oracle replay is exact:
  *
  *  - computed over RAW UTF-8 BYTES, not code points (multi-byte code
  *    points count per byte — the cross-engine-portable choice; ASCII
  *    inputs are unaffected);
  *  - match window = max(|a|,|b|)/2 − 1 (integer division, clamped ≥ 0);
  *  - transpositions = (# order-mismatched matched positions) / 2 with
  *    INTEGER division;
  *  - either side empty → 0.0; no matches → 0.0;
  *  - Winkler boost only when jaro > 0.7, common-prefix capped at 4,
  *    scaling 0.1: jw = j + prefix·0.1·(1−j).
  *
  * Float discipline: the only float ops are the three divisions of the
  * Jaro formula summed left-to-right, one division by 3, and the boost
  * chain — identical order to the oracle engine, so doubles match
  * bit-for-bit and a ppm rounding gates safely.
  */
object StringSimilarity {

  /** (jaro, commonPrefixBytes) over raw UTF-8 bytes. */
  private[functions] def jaroBytes(a: Array[Byte], b: Array[Byte]): (Double, Int) = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return (0.0, 0)
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val amatch = new Array[Boolean](la)
    val bmatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bmatch(j) && a(i) == b(j)) {
          amatch(i) = true; bmatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return (0.0, 0)
    // order-mismatch count over the matched subsequences
    var mismatch = 0
    var j = 0
    i = 0
    while (i < la) {
      if (amatch(i)) {
        while (!bmatch(j)) j += 1
        if (a(i) != b(j)) mismatch += 1
        j += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val jaro =
      (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    var p = 0
    val pmax = math.min(4, math.min(la, lb))
    while (p < pmax && a(p) == b(p)) p += 1
    (jaro, p)
  }

  /** TRUE Damerau–Levenshtein (Lowrance–Wagner: a transposed pair may
    * be edited between — "CA"→"ABC" = 2, where the restricted/OSA
    * variant says 3), over raw UTF-8 bytes with the 256-entry
    * last-occurrence table. Byte semantics match DuckDB's
    * `damerau_levenshtein` exactly (probe-verified, incl. multi-byte
    * code points counting per byte). O(|a|·|b|) time and memory — name
    * / title-sized inputs; cap lengths upstream for document bodies. */
  private[functions] def damerauLevenshtein(a: Array[Byte],
      b: Array[Byte]): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxDist = la + lb
    val da = new Array[Int](256)
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxDist
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxDist; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = maxDist; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xFF)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1,
            d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))
        j += 1
      }
      da(a(i - 1) & 0xFF) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  private[functions] def jaro(a: UTF8String, b: UTF8String): Double =
    jaroBytes(a.getBytes, b.getBytes)._1

  private[functions] def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val (j, p) = jaroBytes(a.getBytes, b.getBytes)
    if (j > 0.7) j + p * 0.1 * (1.0 - j) else j
  }
}

private[functions] trait StringPairExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got (${l.sql}, ${r.sql})")
    }
  /** The JIT-compiled pair kernel; codegen calls it through a plan
    * reference (r8 — no CodegenFallback row materialization in the
    * pair-mining scans). */
  def pairKernel(a: UTF8String, b: UTF8String): Double
  override def nullSafeEval(l: Any, r: Any): Any =
    pairKernel(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pairExpr", this,
      classOf[StringPairExpression].getName)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $ref.pairKernel($l, $r);")
  }
}

/** jaro_similarity(a, b) → double in [0,1]. */
case class JaroSimilarity(left: Expression, right: Expression)
    extends StringPairExpression {
  override def pairKernel(a: UTF8String, b: UTF8String): Double =
    StringSimilarity.jaro(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "jaro_similarity"
}

/** jaro_winkler_similarity(a, b) → double in [0,1] (boost > 0.7,
  * prefix cap 4, scaling 0.1). */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringPairExpression {
  override def pairKernel(a: UTF8String, b: UTF8String): Double =
    StringSimilarity.jaroWinkler(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler_similarity"
}

/** damerau_levenshtein(a, b) → int: TRUE (unrestricted) transposition
  * edit distance — the typo-tolerant complement of the builtin
  * `levenshtein` ("teh"→"the" costs 1, not 2). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got (${l.sql}, ${r.sql})")
    }
  /** Public for the generated code (r8 codegen, plan-reference call). */
  def kernel(a: UTF8String, b: UTF8String): Int =
    StringSimilarity.damerauLevenshtein(a.getBytes, b.getBytes)
  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("dlExpr", this,
      classOf[DamerauLevenshtein].getName)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $ref.kernel($l, $r);")
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "damerau_levenshtein"
}

/** `substring_count_all(text, patterns)` → array<long>: NON-OVERLAPPING
  * occurrence count of every literal pattern in one left-to-right scan
  * each — the substring-level companion of the token blocklist
  * (PII markers, boilerplate phrases, injection strings survive inside
  * words where `arrays_overlap` on tokens cannot see them). Counting is
  * the `replace` convention: at a match, advance past it — so an
  * external engine replays each count as
  * `(length(t) − length(replace(t, p, ''))) / length(p)` exactly.
  * Byte-level search over UTF-8 (a whole valid-UTF-8 pattern can only
  * match on character boundaries — self-synchronizing), patterns ship
  * as a broadcast-literal reference object, the scan is one static call
  * inside whole-stage codegen. */
object SubstringCountAll {
  def countBytes(t: Array[Byte], pats: Array[Array[Byte]]): Array[Long] = {
    val out = new Array[Long](pats.length)
    var pi = 0
    while (pi < pats.length) {
      val p = pats(pi)
      if (p.length > 0 && p.length <= t.length) {
        var i = 0; var c = 0L
        val limit = t.length - p.length
        while (i <= limit) {
          var j = 0
          while (j < p.length && t(i + j) == p(j)) j += 1
          if (j == p.length) { c += 1; i += p.length } else i += 1
        }
        out(pi) = c
      }
      pi += 1
    }
    out
  }
}

case class SubstringCountAll(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "substring_count_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"substring_count_all expects string, got ${t.sql}")
  }

  @transient private lazy val patBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      SubstringCountAll.countBytes(
        v.asInstanceOf[UTF8String].getBytes, patBytes))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val pats = ctx.addReferenceObj("pats", patBytes, "byte[][]")
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.SubstringCountAll.countBytes($a.getBytes(), $pats))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
