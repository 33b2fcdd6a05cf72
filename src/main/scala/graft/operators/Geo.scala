package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Geospatial joins over lat/lon points (the reference's `location`
  * field, docarray/document/data.py:53) — great-circle nearest-neighbor
  * retrieval with grid blocking, the geo sibling of [[Knn]]'s
  * embedding-space search and [[Dedup.gridPairs2d]]'s planar blocking.
  *
  * Scale shape: a naive geo-nearest is a cross join (L×R haversines).
  * Blocking assigns every point to a degree-grid cell and joins each
  * left point against only the 3×3 cell neighborhood, so candidate rows
  * stay ~9·density·L instead of L·R, and the shuffle keys on cell ids.
  * Completeness: with cellLatDeg ≥ the worst-case latitude span and
  * cellLonDeg ≥ the worst-case longitude span of `radiusKm`, any point
  * within the radius lies in the neighborhood. The latitude span is at
  * most radiusKm along a meridian (≥110.57 km/deg; 110 used,
  * conservative). The longitude span needs the EXACT spherical bound
  * 2·asin(sin(D/2R)/cos φmax) — the planar D/(111·cosφ) UNDERSHOOTS on
  * a sphere (at φ=60°, D=3000 km it gives 54.5° vs the true 55.6°, a
  * miss the q251 oracle caught); when the radius out-spans the
  * latitude band entirely the lon cell degrades to a single stripe
  * (grid becomes lat-band-only — correct, just less selective). The
  * longitude grid is CIRCULAR: 360° splits into nLon ≥ 1 equal cells
  * of width ≥ the bound, neighbor indices wrap mod nLon, so pairs
  * across lon=±180 block correctly (q251's supplier at lon −180 vs
  * customers at +131 — the first cut missed them; the oracle caught
  * that too). Latitude does not wrap (poles are outside maxAbsLatDeg
  * by construction).
  */
object Geo {

  /** For each left point, the k nearest right points within `radiusKm`
    * great-circle km. Returns (leftId, rightId, dist_km, rank) with
    * rank 1..k ascending by (distance rounded to 1e-3 km — meter
    * precision, rightId); the quantized sort key makes the order
    * (hence the result set) engine- and layout-replayable — ulp-level
    * trig differences against a replaying oracle would otherwise flip
    * near-tied rows, and meter steps sit ~9 orders of magnitude above
    * the float error (the q230 below-the-ulp rounding lesson).
    *
    * Plan: grid-cell assign both sides (map-only) → explode left to its
    * 3×3 neighborhood (9 rows, carries only id+coords) → equi-join on
    * cell → codegen haversine + radius filter → per-left top-k via a
    * rank window PARTITIONED by left id (never global). At 100 TB the
    * join shuffles candidate pairs only — ~9·(points per cell) per left
    * row; size cells via radiusKm so cell occupancy stays O(100).
    */
  def nearestWithin(left: DataFrame, right: DataFrame,
      leftId: String, leftLat: String, leftLon: String,
      rightId: String, rightLat: String, rightLon: String,
      radiusKm: Double, k: Int, maxAbsLatDeg: Double = 75.0): DataFrame = {
    require(radiusKm > 0 && k >= 1, s"need radiusKm>0, k>=1")
    require(maxAbsLatDeg > 0 && maxAbsLatDeg < 89.0,
      s"maxAbsLatDeg must be in (0, 89), got $maxAbsLatDeg")
    val cellLat = radiusKm / 110.0
    // exact spherical worst-case lon span at the widest usable latitude,
    // inflated 1%; asin saturates -> one full stripe when the radius
    // out-spans the band (see completeness note above)
    val sinHalf = math.sin(radiusKm / (2.0 * GeoFunctions.EarthRadiusKm))
    val cosMax = math.cos(math.toRadians(maxAbsLatDeg))
    val lonSpan =
      if (sinHalf >= cosMax) 360.0
      else math.toDegrees(2.0 * math.asin(sinHalf / cosMax)) * 1.01
    // circular lon grid: nLon equal cells of width 360/nLon >= lonSpan;
    // below 3 cells the +-1 neighborhood would self-overlap, so the lon
    // dimension collapses to a single stripe
    val nLon = math.max(1L, math.floor(360.0 / lonSpan).toLong)
    val wrapLon = nLon >= 3L
    val lonCellW = 360.0 / nLon.toDouble
    def pts(df: DataFrame, id: String, la: String, lo: String, p: String) =
      df.select(col(id).as(s"_id$p"),
          col(la).cast("double").as(s"_la$p"),
          col(lo).cast("double").as(s"_lo$p"))
        .where(col(s"_la$p").isNotNull && col(s"_lo$p").isNotNull &&
          abs(col(s"_la$p")) <= maxAbsLatDeg)
        .withColumn("_cx", if (!wrapLon) lit(0L) else
          pmod(floor((col(s"_lo$p") + 180.0) / lonCellW).cast("long"),
            lit(nLon))) // lon=+180 folds onto the -180 cell
        .withColumn("_cy", floor(col(s"_la$p") / cellLat).cast("long"))
    val l = pts(left, leftId, leftLat, leftLon, "l")
    val r = pts(right, rightId, rightLat, rightLon, "r")
    val offs = Seq(-1L, 0L, 1L)
    val lx = l
      .withColumn("_dx", explode(array(
        (if (wrapLon) offs else Seq(0L)).map(lit): _*)))
      .withColumn("_dy", explode(array(offs.map(lit): _*)))
      .select(col("_idl"), col("_lal"), col("_lol"),
        (if (wrapLon) pmod(col("_cx") + col("_dx"), lit(nLon))
         else col("_cx")).as("_cx"),
        (col("_cy") + col("_dy")).as("_cy"))
    val cand = lx.join(r, Seq("_cx", "_cy"))
      .withColumn("_d", GeoFunctions.haversineKm(
        col("_lal"), col("_lol"), col("_lar"), col("_lor")))
      .where(col("_d") <= radiusKm)
      .withColumn("_dr", round(col("_d") * 1e3) / 1e3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_idl")).orderBy(col("_dr"), col("_idr"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("_idl").as("left_id"), col("_idr").as("right_id"),
        col("_dr").as("dist_km"), col("rank"))
  }
}
