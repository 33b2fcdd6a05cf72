package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Ann

/** The map-only IVF assignment kernel (round 9): value-equal to the
  * declarative crossJoin+top-k formulation it replaced, ordered, and
  * honest about nulls. */
class NearestCellsSpec extends SparkSuite {
  import spark.implicits._

  private val cents = Seq(
    Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(7.0, 7.0))
  private val ids = Seq(0, 1, 2, 3)

  test("kernel == crossJoin+topk reference on random vectors") {
    val docs = spark.range(500).select(col("id"),
      array((0 until 2).map(j =>
        (pmod(xxhash64(col("id"), lit(j)), lit(1000)) / 50.0) - 10.0): _*)
        .as("v"))
    val got = docs.select(col("id"),
        explode(nearest_cells(col("v"), cents, ids, 2)).as("_cell"))
      .groupBy("id").agg(sort_array(collect_list("_cell")).as("cells"))
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("_cell", "_center")
    val ref = docs.crossJoin(broadcast(centDf))
      .groupBy("id")
      .agg(topk_by_distance(
        vector_distance(col("v"), col("_center"), "euclidean"),
        col("_cell"), 2).as("_cells"))
      .select(col("id"), sort_array(transform(col("_cells.value"),
        c => c.cast("int"))).as("cells"))
    assert(got.join(ref, Seq("id", "cells"), "left_anti").count() == 0)
    assert(got.count() == 500 && ref.count() == 500)
  }

  test("ordering, ids mapping, m > nCells, dim mismatch, null element") {
    val out = Seq(Seq(9.9, 0.1)).toDF("v")
      .select(nearest_cells(col("v"), cents, Seq(40, 41, 42, 43), 3))
      .head.getSeq[Int](0)
    assert(out == Seq(41, 43, 40)) // nearest first, mapped through ids
    val all = Seq(Seq(0.0, 0.0)).toDF("v")
      .select(nearest_cells(col("v"), cents, ids, 9)).head.getSeq[Int](0)
    // m capped at nCells; full ordering by distance (c3 at d²=98 beats
    // the c1/c2 tie at 100, which resolves first-index-first)
    assert(all == Seq(0, 3, 1, 2))
    val bad = Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(nearest_cells(col("v"), cents, ids, 2)).head
    assert(bad.isNullAt(0)) // dim mismatch -> null, never a wrong cell
    val withNull = Seq((1, Seq(Some(1.0), None))).toDF("i", "v")
      .select(nearest_cells(col("v"), cents, ids, 2)).head
    assert(withNull.isNullAt(0))
    // NaN/Inf elements -> null, never a fabricated cell (a NaN distance
    // fails every comparison, so an unchecked kernel would emit ids(0))
    val withNaN = Seq(Seq(Double.NaN, 1.0)).toDF("v")
      .select(nearest_cells(col("v"), cents, ids, 2)).head
    assert(withNaN.isNullAt(0))
    val withInf = Seq(Seq(Double.PositiveInfinity, 1.0)).toDF("v")
      .select(nearest_cells(col("v"), cents, ids, 2)).head
    assert(withInf.isNullAt(0))
  }

  test("ivfBuild multiAssign rides the kernel: map-only plan, search still correct") {
    val docs = spark.range(2000).select(col("id"),
      transform(sequence(lit(0), lit(7)), j =>
        (pmod(xxhash64(col("id"), j), lit(10000)) / 10000.0))
        .as("embedding"))
    val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 8,
      maxIter = 5, multiAssign = 2, center = true)
    // every doc sits in exactly 2 cells
    val perDoc = idx.assigned.groupBy("id").agg(count(lit(1)).as("n"))
    assert(perDoc.where(col("n") =!= 2).count() == 0)
    // the multi-assign plan is exchange-free between scan and assignment
    val plan = idx.assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"multi-assign assignment should be map-only, got:\n$plan")
    // probing every cell recovers exact brute-force top-k
    val q = docs.where(col("id") < 5)
    val exact = graft.operators.Knn.bruteForce(docs, q, 5, "cosine")
    val viaIvf = Ann.ivfSearch(idx, q, 5, nProbe = 8)
    assert(Ann.recallAgainstExact(viaIvf, exact) == 1.0)
    // the blocked kernel handles multi-assign since r9 (k·A partition
    // heaps + per-(query,doc) dedup): result set equals the join path
    // at partial AND full probe depth
    for (p <- Seq(3, 8)) {
      val join = Ann.ivfSearch(idx, q, 5, nProbe = p)
        .select("query_id", "id", "rank")
      val blocked = Ann.ivfSearchBlocked(idx, q, 5, nProbe = p)
        .select("query_id", "id", "rank")
      assert(join.exceptAll(blocked).count() == 0 &&
        blocked.exceptAll(join).count() == 0, s"mismatch at nProbe=$p")
    }
  }
}
