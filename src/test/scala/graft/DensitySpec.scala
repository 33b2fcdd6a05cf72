package graft

import org.apache.spark.sql.functions._
import graft.operators.Density

/** DBSCAN (grid-blocked, deterministic) vs an in-memory reference
  * implementation: kinds, cluster ids, border tie rule, layout
  * invariance. */
class DensitySpec extends SparkSuite {
  import spark.implicits._

  /** Reference DBSCAN: brute-force pairs + union-find, min-id labels,
    * border -> min core-neighbor cluster. */
  private def refDbscan(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int): Map[Long, (String, Option[Long])] = {
    val ids = pts.map(_._1)
    def d2(a: (Long, Double, Double), b: (Long, Double, Double)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map { p =>
      p._1 -> pts.filter(q => q._1 != p._1 && d2(p, q) <= eps * eps).map(_._1)
    }.toMap
    val core = ids.filter(i => nbrs(i).size + 1 >= minPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(i: Long): Long =
      if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    for (i <- core; j <- nbrs(i) if core(j)) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val coreLbl = core.map(i => i -> find(i)).toMap
    ids.map { i =>
      if (core(i)) i -> (("core", Some(coreLbl(i))))
      else {
        val cn = nbrs(i).filter(core)
        if (cn.nonEmpty) i -> (("border", Some(cn.map(coreLbl).min)))
        else i -> (("noise", None))
      }
    }.toMap
  }

  private def run(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int, parts: Int = 5): Map[Long, (String, Option[Long])] =
    Density.dbscan2d(pts.toDF("id", "x", "y").repartition(parts),
        "id", "x", "y", eps, minPts)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap

  test("dbscan2d equals the brute-force reference on random points") {
    val rnd = new scala.util.Random(41)
    val pts = (0L until 400L).map(i =>
      (i, rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1))
    val eps = 0.09
    val want = refDbscan(pts, eps, minPts = 4)
    val got = run(pts, eps, minPts = 4)
    assert(got == want)
    // all three kinds must actually occur for this to prove anything
    val kinds = want.values.map(_._1).toSet
    assert(kinds == Set("core", "border", "noise"))
    // and at least two distinct clusters
    assert(want.values.flatMap(_._2).toSet.size >= 2)
  }

  test("dbscan2d is layout-invariant") {
    val rnd = new scala.util.Random(7)
    val pts = (0L until 200L).map(i =>
      (i, rnd.nextDouble(), rnd.nextDouble()))
    assert(run(pts, 0.06, 3, parts = 1) == run(pts, 0.06, 3, parts = 13))
  }

  test("border point between two clusters attaches to the smaller cluster id") {
    // two 4-point cores, one border point within eps of exactly one core
    // member of each cluster (deg 2 + self = 3 < minPts 4 -> border)
    val pts = Seq(
      (10L, 0.00, 0.0), (11L, 0.04, 0.0), (12L, 0.08, 0.0), (13L, 0.12, 0.0),
      (20L, 0.60, 0.0), (21L, 0.56, 0.0), (22L, 0.52, 0.0), (23L, 0.48, 0.0),
      (5L, 0.30, 0.0)) // reaches 13 (d .18) and 23 (d .18) only
    val got = run(pts, eps = 0.2, minPts = 4)
    assert(got(5L) == (("border", Some(10L))))
    assert(got(10L)._1 == "core" && got(20L)._1 == "core")
    assert(got(13L)._2 == Some(10L) && got(23L)._2 == Some(20L))
  }

  test("isolated dense pair: cores with no other core form their own cluster; minPts=1 makes singletons core") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.01, 0.0), (9L, 5.0, 5.0))
    val got = run(pts, eps = 0.05, minPts = 2)
    assert(got(1L) == (("core", Some(1L))))
    assert(got(2L) == (("core", Some(1L))))
    assert(got(9L) == (("noise", None)))
    val all1 = run(pts, eps = 0.05, minPts = 1)
    assert(all1(9L) == (("core", Some(9L)))) // self-sufficient core
  }

  test("null coordinates are dropped, not clustered") {
    val df = Seq((1L, Some(0.0), Some(0.0)), (2L, Some(0.01), Some(0.0)),
        (3L, None: Option[Double], Some(1.0)))
      .toDF("id", "x", "y")
    val out = Density.dbscan2d(df, "id", "x", "y", 0.05, 1)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }
}
