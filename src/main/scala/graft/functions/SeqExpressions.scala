package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequence-alignment primitives for text-generation evaluation
  * (ROUGE-L and friends): exact integer dynamic programming per row, so
  * the derived metrics are deterministic and replayable by an external
  * SQL engine (the oracle folds the same DP table with list_reduce).
  */

/** lcs_length(a, b) → int: longest-common-subsequence length of two
  * token arrays (classic O(|a|·|b|) two-row DP — the per-row cost every
  * ROUGE implementation pays; null elements never match). */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_length expects (array<string>, array<string>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("lcsExpr", this,
      classOf[LcsLength].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.kernel($l, $r);")
  }
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val bj = if (b.isNullAt(j - 1)) null else b.getUTF8String(j - 1)
        cur(j) =
          if (ai != null && bj != null && ai.equals(bj)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "lcs_length"
}

/** dtw_distance(a, b) → long: dynamic-time-warping alignment cost of
  * two integer series under |aᵢ − bⱼ| cost (full window, classic
  * O(n·m) two-row DP) — the shape-similarity measure for time series
  * that tolerates local stretching (daily-volume curves, session
  * rhythms). Boundary semantics: dp(0,0) = 0, first row/column
  * unreachable (a large finite sentinel, so the same fold replays in
  * any engine without IEEE infinities). Exact integers throughout;
  * empty or null-element inputs yield null. */
case class DtwDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  // empty/null-element inputs yield null even from non-null children —
  // and declaring it keeps nullSafeCodeGen's isNull variable MUTABLE
  // (with non-nullable children the default takes the FalseLiteral
  // path and the generated `isNull = true` fails Janino compilation)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dtw_distance expects (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }

  private val Inf = 1000000000000000L // 1e15: finite, engine-portable

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("dtwExpr", this,
      classOf[DtwDistance].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val o = ctx.freshName("dtwOut")
      s"""java.lang.Long $o = $ref.kernel($l, $r);
         |if ($o == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $o.longValue(); }""".stripMargin
    })
  }
  /** Public for the generated code (r8 plan-reference call); null when
    * either side is empty or has null elements. */
  def kernel(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    var j = 0
    while (j < m) { if (b.isNullAt(j)) return null; j += 1 }
    val prev = new Array[Long](m + 1)
    val cur = new Array[Long](m + 1)
    java.util.Arrays.fill(prev, Inf); prev(0) = 0L
    i = 1
    while (i <= n) {
      cur(0) = Inf
      val ai = a.getLong(i - 1)
      j = 1
      while (j <= m) {
        val cost = math.abs(ai - b.getLong(j - 1))
        cur(j) = cost + math.min(prev(j - 1), math.min(prev(j), cur(j - 1)))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "dtw_distance"
}
