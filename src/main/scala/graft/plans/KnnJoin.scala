package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Whole-operator knn as a first-class Catalyst citizen: a logical
  * `KnnJoin` node, a planner [[KnnStrategy]], and a physical
  * [[KnnJoinExec]] running the primitive block kernel.
  *
  * This is the (c) tier of the custom-operator ladder (compose < custom
  * Expression < custom plan): the knn "theta-join + per-group top-k"
  * (reference: docarray/array/mixins/find.py:88-249) becomes visible to the
  * planner as one unit instead of a crossJoin+aggregate idiom, so the
  * physical strategy — collect+broadcast the small query side, stream doc
  * partitions through per-query bounded heaps, heap-merge partials — is
  * chosen explicitly, and EXPLAIN shows `KnnJoinExec` rather than a
  * generic BNLJ.
  *
  * Contract: both children must produce exactly (id, vector) columns, the
  * vector as array<double>. Output: query_id, id, distance, rank.
  */
case class KnnJoin(
    left: LogicalPlan,   // docs (id, vec)
    right: LogicalPlan,  // queries (id, vec) — small side
    k: Int,
    metric: String,
    excludeSelf: Boolean,
    // in the constructor so exprIds stay stable across optimizer copies
    override val output: Seq[Attribute]) extends BinaryNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  // the kernel consumes both (id, vec) columns of each child — declare them
  // so ColumnPruning doesn't strip the children to empty projections
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): KnnJoin =
    copy(left = newLeft, right = newRight)
}

object KnnJoin {
  /** Build with fresh output attributes typed from the children. */
  def create(docs: LogicalPlan, queries: LogicalPlan, k: Int, metric: String,
      excludeSelf: Boolean): KnnJoin =
    KnnJoin(docs, queries, k, metric, excludeSelf, Seq(
      AttributeReference("query_id", queries.output.head.dataType)(),
      AttributeReference("id", docs.output.head.dataType)(),
      AttributeReference("distance", DoubleType, nullable = false)(),
      AttributeReference("rank", IntegerType, nullable = false)()))
}

object KnnStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnJoin(docs, queries, k, metric, excludeSelf, out) =>
      KnnJoinExec(planLater(docs), planLater(queries), k, metric, excludeSelf,
        out) :: Nil
    case _ => Nil
  }
}

case class KnnJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    k: Int,
    metric: String,
    excludeSelf: Boolean,
    override val output: Seq[Attribute]) extends BinaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val docIdType = left.output.head.dataType
    val qIdType = right.output.head.dataType

    // small side: collect once on the driver, broadcast primitives
    val qRows = right.executeCollect()
    val qIds: Array[Any] = qRows.map(r => InternalRow.copyValue(r.get(0, qIdType)))
    val qVecs: Array[Array[Double]] = qRows.map(_.getArray(1).toDoubleArray())
    val bc = sparkContext.broadcast((qIds, qVecs))
    val m = metric
    val ex = excludeSelf
    val kk = k

    val tieOrd = PayloadOrdering.forType(docIdType)
    val partials: RDD[(Int, TopKBuffer)] = left.execute().mapPartitions { rows =>
      val (ids, vecs) = bc.value
      val qNorms = vecs.map(KnnJoinExec.norm)
      val heaps = Array.fill(vecs.length)(new TopKBuffer(kk, tieOrd))
      rows.foreach { row =>
        if (!row.isNullAt(1)) {
          val idVal = InternalRow.copyValue(row.get(0, docIdType))
          val v = row.getArray(1).toDoubleArray()
          KnnJoinExec.scoreRow(m, v, idVal, vecs, qNorms, ids, heaps, ex)
        }
      }
      heaps.iterator.zipWithIndex.map(_.swap)
    }

    partials
      .reduceByKey((a, b) => { b.sortedEntries.foreach { case (d, v) => a.insert(d, v) }; a },
        numPartitions = math.max(1, math.min(qIds.length,
          conf.numShufflePartitions))) // merge width follows the session conf
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
        val (ids, _) = bc.value
        it.flatMap { case (qIdx, heap) =>
          heap.sortedEntries.iterator.zipWithIndex.map { case ((d, id), pos) =>
            proj.apply(InternalRow(ids(qIdx), id, d, pos + 1)).copy()
          }
        }
      }
  }

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): KnnJoinExec =
    copy(left = newLeft, right = newRight)
}

object KnnJoinExec {

  // r10 (guide §1.2 per-task work): every distance accumulation below is
  // a 4-chain stride-4 unroll with a sequential tail, combined as
  // (s0+s1)+(s2+s3). A single `acc +=` chain serializes on FP-add
  // latency (~4 cycles/element — measured 0.6 GFLOP/s/core on the knn
  // rows); four independent chains pipeline it. The SAME grouping is
  // used in VectorDistance (interpreted + codegen) and
  // VectorKernels.nearestCells so every kernel/expression pair that was
  // bit-consistent before stays bit-consistent now. Vectors shorter
  // than 4 take only the tail — bit-identical to the old sequential sum.

  @inline def dot4(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    val k = n & ~3
    var i = 0
    while (i < k) {
      s0 += a(i) * b(i); s1 += a(i + 1) * b(i + 1)
      s2 += a(i + 2) * b(i + 2); s3 += a(i + 3) * b(i + 3)
      i += 4
    }
    while (i < n) { s0 += a(i) * b(i); i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  @inline def sqeuclidean4(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    val k = n & ~3
    var i = 0
    while (i < k) {
      val d0 = a(i) - b(i); s0 += d0 * d0
      val d1 = a(i + 1) - b(i + 1); s1 += d1 * d1
      val d2 = a(i + 2) - b(i + 2); s2 += d2 * d2
      val d3 = a(i + 3) - b(i + 3); s3 += d3 * d3
      i += 4
    }
    while (i < n) { val d = a(i) - b(i); s0 += d * d; i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  @inline def normSq(v: Array[Double]): Double = dot4(v, v, v.length)

  @inline def norm(v: Array[Double]): Double = math.sqrt(normSq(v))

  /** Score one doc row against every query, updating the per-query heaps.
    * Cosine hoists the norms: doc norm once per doc, query norms
    * precomputed — bit-identical to the interleaved loop (independent
    * accumulators), ~3× fewer multiplications for Q > 1. */
  def scoreRow(metric: String, v: Array[Double], idVal: Any,
      vecs: Array[Array[Double]], qNorms: Array[Double], ids: Array[Any],
      heaps: Array[TopKBuffer], excludeSelf: Boolean): Unit = {
    val nq = vecs.length
    if (metric == "cosine") {
      val dn = norm(v)
      var q = 0
      while (q < nq) {
        if (!(excludeSelf && idVal == ids(q))) {
          val b = vecs(q)
          val dot = dot4(v, b, math.min(v.length, b.length))
          val d = 1.0 - dot / (dn * qNorms(q))
          if (!d.isNaN) heaps(q).insert(d, idVal)
        }
        q += 1
      }
    } else {
      var q = 0
      while (q < nq) {
        if (!(excludeSelf && idVal == ids(q))) {
          val d = distOf(metric, v, vecs(q))
          if (!d.isNaN) heaps(q).insert(d, idVal)
        }
        q += 1
      }
    }
  }

  /** [[scoreRow]] restricted to a query-index subset — the IVF
    * cell-pruned kernel: only the queries that probed this doc's cell
    * are scored. Same hoisted-norm cosine math as scoreRow, so results
    * are bit-identical to the full-scan kernel on the scored subset. */
  def scoreRowSubset(metric: String, v: Array[Double], idVal: Any,
      vecs: Array[Array[Double]], qNorms: Array[Double],
      heaps: Array[TopKBuffer], qs: Array[Int]): Unit = {
    if (metric == "cosine") {
      val dn = norm(v)
      var j = 0
      while (j < qs.length) {
        val q = qs(j)
        val b = vecs(q)
        val dot = dot4(v, b, math.min(v.length, b.length))
        val d = 1.0 - dot / (dn * qNorms(q))
        if (!d.isNaN) heaps(q).insert(d, idVal)
        j += 1
      }
    } else {
      var j = 0
      while (j < qs.length) {
        val q = qs(j)
        val d = distOf(metric, v, vecs(q))
        if (!d.isNaN) heaps(q).insert(d, idVal)
        j += 1
      }
    }
  }

  @inline def distOf(metric: String, a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    metric match {
      case "cosine" =>
        // independent-chain sums: same values as the hoisted-norm kernel
        // in scoreRow (dot4 there, dot4(a,a)/dot4(b,b) = normSq here)
        1.0 - dot4(a, b, n) /
          (math.sqrt(dot4(a, a, n)) * math.sqrt(dot4(b, b, n)))
      case "sqeuclidean" => sqeuclidean4(a, b, n)
      case "euclidean" => math.sqrt(sqeuclidean4(a, b, n))
      case _ => -dot4(a, b, n)
    }
  }
}
