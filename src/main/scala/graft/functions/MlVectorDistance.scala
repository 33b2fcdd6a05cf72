package graft.functions

import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Distance kernels over `ml.linalg.Vector` columns (VectorUDT) —
  * supports SPARSE vectors natively with merge-loop math, the Spark
  * counterpart of the reference's scipy.sparse embeddings
  * (reference: docarray/math/distance/numpy.py:26-90 sparse variants,
  * docarray/proto/docarray.proto:30-48 SparseNdArrayProto).
  *
  * Operates directly on the UDT's serialized struct
  * (type: byte [0=sparse,1=dense], size, indices, values) — no
  * deserialization to Vector objects in the hot loop. Sparse×sparse is an
  * index merge over nonzeros (O(nnz_a + nnz_b)); distances that need norms
  * use ||a-b||² = a·a + b·b - 2a·b.
  */
case class MlVectorDistance(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"ml_${metric}_distance"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == SQLDataTypes.VectorType)
    if (!VectorDistance.metrics.contains(metric))
      TypeCheckResult.TypeCheckFailure(s"unknown metric '$metric'")
    else if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects two vector columns, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  // (isDense, indices-or-null, values)
  private def unpack(v: Any): (Boolean, Array[Int], Array[Double]) = {
    val row = v.asInstanceOf[InternalRow]
    if (row.getByte(0) == 1) (true, null, row.getArray(3).toDoubleArray())
    else (false, row.getArray(2).toIntArray(), row.getArray(3).toDoubleArray())
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[InternalRow], r.asInstanceOf[InternalRow])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("mlvExpr", this,
      classOf[MlVectorDistance].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.kernel($l, $r);")
  }
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(l: InternalRow, r: InternalRow): Double = {
    val (ad, ai, av) = unpack(l)
    val (bd, bi, bv) = unpack(r)
    val dot = dotOf(ad, ai, av, bd, bi, bv)
    val na = selfDot(av)
    val nb = selfDot(bv)
    metric match {
      case "cosine" => 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
      case "sqeuclidean" => math.max(na + nb - 2.0 * dot, 0.0)
      case "euclidean" => math.sqrt(math.max(na + nb - 2.0 * dot, 0.0))
      case _ => -dot
    }
  }

  @inline private def selfDot(v: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    acc
  }

  private def dotOf(ad: Boolean, ai: Array[Int], av: Array[Double],
      bd: Boolean, bi: Array[Int], bv: Array[Double]): Double = {
    var acc = 0.0
    if (!ad && !bd) { // sparse × sparse: merge join on indices
      var i = 0; var j = 0
      while (i < ai.length && j < bi.length) {
        if (ai(i) == bi(j)) { acc += av(i) * bv(j); i += 1; j += 1 }
        else if (ai(i) < bi(j)) i += 1
        else j += 1
      }
    } else if (!ad) { // sparse × dense
      var i = 0
      while (i < ai.length) {
        if (ai(i) < bv.length) acc += av(i) * bv(ai(i))
        i += 1
      }
    } else if (!bd) { // dense × sparse
      var j = 0
      while (j < bi.length) {
        if (bi(j) < av.length) acc += bv(j) * av(bi(j))
        j += 1
      }
    } else { // dense × dense
      var i = 0
      val n = math.min(av.length, bv.length)
      while (i < n) { acc += av(i) * bv(i); i += 1 }
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
