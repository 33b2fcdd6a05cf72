package graft

import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions
import graft.operators.Geo

/** Geo functions and the grid-blocked nearest join: canonical geohash
  * vectors, haversine sanity distances, and blocked-vs-brute-force
  * parity including antimeridian wrap. */
class GeoSpec extends SparkSuite {
  import spark.implicits._

  private def gh(lat: Double, lon: Double, p: Int): String =
    Seq((lat, lon)).toDF("la", "lo")
      .select(GeoFunctions.geohash(col("la"), col("lo"), p)).head.getString(0)

  test("geohash: canonical vectors and prefix truncation") {
    // the textbook example (geohash.org / Wikipedia)
    assert(gh(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(gh(57.64911, 10.40744, 5) == "u4pru")
    assert(gh(0.0, 0.0, 12) == "s00000000000")
    // corner clamping: the poles/antimeridian land in edge cells
    assert(gh(90.0, 180.0, 1) == "z")
    assert(gh(-90.0, -180.0, 1) == "0")
    // prefix property: higher precision extends, never rewrites
    val full = gh(48.8583, 2.2945, 9)
    assert((1 to 8).forall(p => gh(48.8583, 2.2945, p) == full.take(p)))
  }

  test("geohashNeighbors: canonical p=1 sets — interior, antimeridian wrap, pole clamp") {
    def nbs(lat: Double, lon: Double): Set[String] =
      Seq((lat, lon)).toDF("la", "lo")
        .select(GeoFunctions.geohashNeighbors(col("la"), col("lo"), 1))
        .head.getSeq[String](0).toSet
    // the standard p=1 base32 map:  b c f g u v y z
    //                               8 9 d e s t w x
    //                               2 3 6 7 k m q r
    //                               0 1 4 5 h j n p
    assert(nbs(0.0, 0.0) ==
      Set("s", "e", "t", "g", "u", "v", "7", "k", "m")) // around 's'
    assert(nbs(0.0, -180.0) ==
      Set("8", "9", "x", "b", "c", "z", "2", "3", "r")) // wraps to col z/x/r
    assert(nbs(90.0, 0.0) ==
      Set("u", "g", "v", "e", "s", "t")) // pole edge clamps -> 6 cells
  }

  test("geohashDecode: inverse of encode up to cell resolution, canonical center") {
    val df = Seq((57.64911, 10.40744), (0.0, 0.0), (-33.9, 151.2))
      .toDF("la", "lo")
      .withColumn("gh", GeoFunctions.geohash(col("la"), col("lo"), 6))
      .withColumn("ctr", GeoFunctions.geohashDecode(col("gh"), 6))
      .withColumn("gh2", GeoFunctions.geohash(
        col("ctr.lat"), col("ctr.lon"), 6))
    val rows = df.collect()
    // re-encoding the decoded center lands back in the SAME cell
    assert(rows.forall(r => r.getString(2) == r.getString(4)))
    // the center is inside the p=6 cell of the original point
    rows.foreach { r =>
      val ctr = r.getStruct(3)
      assert(math.abs(ctr.getDouble(0) - r.getDouble(0)) < 180.0 / (1 << 15))
      assert(math.abs(ctr.getDouble(1) - r.getDouble(1)) < 360.0 / (1 << 15))
    }
  }

  test("haversine: zero, equator degree, antipodes, known city pair") {
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278))
      .toDF("a", "b", "c", "d")
      .select(GeoFunctions.haversineKm(col("a"), col("b"), col("c"), col("d"))
        .as("km"),
        GeoFunctions.haversineKm(col("a"), col("b"), col("a"), col("b"))
          .as("zero"),
        GeoFunctions.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(1.0))
          .as("deg"),
        GeoFunctions.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(180.0))
          .as("anti")).head
    assert(math.abs(d.getDouble(0) - 343.5) < 1.0) // Paris-London
    assert(d.getDouble(1) == 0.0)
    assert(math.abs(d.getDouble(2) - 111.19) < 0.01)
    assert(math.abs(d.getDouble(3) - math.Pi * GeoFunctions.EarthRadiusKm)
      < 1e-6)
  }

  test("nearestWithin: parity with brute force, wrap across the antimeridian, lat filter") {
    // deterministic scattered points on both sides of lon=180
    val l = (1L to 60L).map(i =>
      (i, (i * 37 % 120).toDouble - 60.0, (i * 91 % 360).toDouble - 180.0))
      .toDF("id", "la", "lo")
    val r = (1L to 40L).map(i =>
      (i, (i * 53 % 120).toDouble - 60.0, (i * 97 % 360).toDouble - 180.0))
      .toDF("id", "la", "lo")
    val got = Geo.nearestWithin(l, r, "id", "la", "lo", "id", "la", "lo",
        radiusKm = 2500.0, k = 2, maxAbsLatDeg = 60.0)
      .orderBy("left_id", "rank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3)))
    val brute = l.select(col("id").as("lid"), col("la").as("a"),
        col("lo").as("b"))
      .crossJoin(r.select(col("id").as("rid"), col("la").as("c"),
        col("lo").as("d")))
      .withColumn("km", GeoFunctions.haversineKm(col("a"), col("b"),
        col("c"), col("d")))
      .where(col("km") <= 2500.0)
      .withColumn("dr", round(col("km") * 1e3) / 1e3)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lid")
          .orderBy(col("dr"), col("rid"))))
      .where(col("rk") <= 2).orderBy("lid", "rk").collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getDouble(7), x.getInt(8)))
    assert(got.nonEmpty && got.toSeq == brute.toSeq)
    // explicit antimeridian pair: 0.2 deg apart across lon=+-180
    val lw = Seq((1L, 10.0, 179.9)).toDF("id", "la", "lo")
    val rw = Seq((7L, 10.0, -179.9)).toDF("id", "la", "lo")
    val w = Geo.nearestWithin(lw, rw, "id", "la", "lo", "id", "la", "lo",
      radiusKm = 50.0, k = 1).collect()
    assert(w.length == 1 && w.head.getLong(1) == 7L &&
      w.head.getDouble(2) < 25.0)
    // out-of-band latitudes are excluded, not mis-blocked
    val lp = Seq((1L, 80.0, 0.0)).toDF("id", "la", "lo")
    assert(Geo.nearestWithin(lp, rw, "id", "la", "lo", "id", "la", "lo",
      radiusKm = 50.0, k = 1, maxAbsLatDeg = 75.0).isEmpty)
  }

  test("plan shape: blocked geo join is an equi-join on cells, never a cross product") {
    val l = (1L to 100L).map(i =>
      (i, (i * 37 % 120).toDouble - 60.0, (i * 91 % 360).toDouble - 180.0))
      .toDF("id", "la", "lo")
    val plan = Geo.nearestWithin(l, l, "id", "la", "lo", "id", "la", "lo",
        radiusKm = 200.0, k = 3, maxAbsLatDeg = 60.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    // the top-k window partitions by the left id — never a global sort
    assert(plan.contains("row_number"))
  }
}
