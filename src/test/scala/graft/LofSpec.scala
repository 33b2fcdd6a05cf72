package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Local Outlier Factor: brute-force Scala replay parity on a planted
  * geometry, the uniform-density ≈ 1 property, a density-relative
  * outlier that kth-distance alone under-ranks, the rsum = 0 duplicate
  * convention, and layout invariance. */
class LofSpec extends SparkSuite {
  import spark.implicits._

  // 2-D points as length-2 float vectors through the real knn kernel
  private def df(pts: Seq[(Long, Double, Double)]) =
    pts.toDF("id", "x", "y")
      .select(col("id"), array(col("x").cast("float"), col("y").cast("float"))
        .as("embedding"))

  private def lofLocal(pts: Seq[(Long, Double, Double)], k: Int)
      : Map[Long, (Long, Long, Long, Double)] = {
    val m = pts.map(p => p._1 -> (p._2, p._3)).toMap
    def dist(a: Long, b: Long): Double = {
      val (ax, ay) = m(a); val (bx, by) = m(b)
      val dx = ax.toFloat.toDouble - bx.toFloat.toDouble
      val dy = ay.toFloat.toDouble - by.toFloat.toDouble
      dx * dx + dy * dy // sqeuclidean, the knn metric below
    }
    val ids = pts.map(_._1)
    val nbrs = ids.map { p =>
      p -> ids.filter(_ != p).map(o => (dist(p, o), o)).sorted.take(k)
    }.toMap
    val kd = nbrs.map { case (p, ns) => p -> ns.last._1 }
    val rsum = nbrs.map { case (p, ns) =>
      p -> ns.map { case (d, o) => math.round(math.max(kd(o), d) * 1e6) }.sum
    }
    val lrd = rsum.map { case (p, s) => p -> (k * 1000000000000000L) / s }
    nbrs.map { case (p, ns) =>
      val num = ns.map { case (_, o) => lrd(o) }.sum
      p -> ((rsum(p), lrd(p), num, num.toDouble / (lrd(p) * k).toDouble))
    }
  }

  test("matches a full local replay on a planted two-density geometry") {
    val dense = (0 until 12).map(i =>
      (i.toLong, (i % 4) * 0.1, (i / 4) * 0.1))
    val sparse = (0 until 6).map(i =>
      (100L + i, 10.0 + (i % 3) * 2.0, (i / 3) * 2.0))
    val outlier = Seq((200L, 0.35, 0.95)) // just off the dense cluster
    val pts = dense ++ sparse ++ outlier
    val got = Knn.lofScores(df(pts), k = 3, metric = "sqeuclidean",
        idCol = "id", vecCol = "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val want = lofLocal(pts, 3)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, v) => assert(v === want(id), s"id $id") }
  }

  test("uniform grid: every LOF within a few percent of 1") {
    val pts = for (i <- 0 until 5; j <- 0 until 5)
      yield ((i * 5 + j).toLong, i.toDouble, j.toDouble)
    val lofs = Knn.lofScores(df(pts), k = 4, metric = "sqeuclidean",
        idCol = "id", vecCol = "embedding")
      .collect().map(r => r.getDouble(4))
    // interior/edge effects keep it near 1, not exactly 1
    lofs.foreach(l => assert(l > 0.6 && l < 1.7, s"lof $l"))
  }

  test("density-relative outlier outranks the sparse cluster's members") {
    val dense = (0 until 10).map(i => (i.toLong, (i % 5) * 0.05, (i / 5) * 0.05))
    val sparse = (0 until 8).map(i => (50L + i, 100.0 + (i % 4) * 5.0, (i / 4) * 5.0))
    val nearDense = Seq((99L, 0.6, 0.6)) // close to dense in absolute terms
    val out = Knn.lofScores(df(dense ++ sparse ++ nearDense), k = 3,
        metric = "sqeuclidean", idCol = "id", vecCol = "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val sparseMax = (0 until 8).map(i => out(50L + i)).max
    assert(out(99L) > sparseMax,
      s"near-dense outlier ${out(99L)} should exceed sparse members $sparseMax")
  }

  test("duplicate cluster (rsum = 0) gets null lrd and lof") {
    val dups = (0 until 4).map(i => (i.toLong, 1.0, 1.0))
    val rest = (0 until 6).map(i => (10L + i, 5.0 + i, 5.0))
    val rows = Knn.lofScores(df(dups ++ rest), k = 3,
        metric = "sqeuclidean", idCol = "id", vecCol = "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(2), r.isNullAt(4))).toMap
    (0 until 4).foreach(i => assert(rows(i.toLong) === ((true, true))))
  }

  test("layout invariance: 1 vs 6 partitions") {
    val pts = (0 until 30).map(i =>
      (i.toLong, (i % 6) * 1.3 + (i % 7) * 0.11, (i / 6) * 0.9))
    def run(parts: Int) =
      Knn.lofScores(df(pts).repartition(parts), k = 4,
          metric = "sqeuclidean", idCol = "id", vecCol = "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
    assert(run(1) === run(6))
  }
}
