package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions over the reference's `location` field
  * (docarray/document/data.py:53 — `location: List[float]`, a bare
  * lat/lon pair the reference stores but gives no operators for; the
  * natural queries over it are distance and spatial bucketing). Both
  * functions are pure `Column` formula trees — native Spark functions
  * only, fully codegen, no UDFs — and both are engine-replayable: the
  * geohash is closed-form integer bit arithmetic, and the haversine is
  * one deterministic IEEE float chain (gates quantize it to meter
  * precision; see SparkEntry's geo queries).
  */
object GeoFunctions {

  /** IUGG mean Earth radius, km. */
  val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two WGS84 lat/lon points via
    * the haversine formula: 2R·asin(√(sin²(Δφ/2) + cosφ₁cosφ₂sin²(Δλ/2))).
    * The argument is clamped to 1.0 so antipodal rounding can't produce
    * NaN. One codegen float chain; ~0.5% model error vs the ellipsoid
    * (haversine is the standard analytics tradeoff). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2.0)
    val sLon = sin(radians(lon2 - lon1) / 2.0)
    val h = sLat * sLat +
      cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(2.0 * EarthRadiusKm) * asin(least(lit(1.0), sqrt(h)))
  }

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash of (lat, lon) at `precision` characters (1–12),
    * as the usual base32 string — the spatial bucketing key (prefix
    * truncation = coarser cell; equal prefixes = nearby points, modulo
    * the well-known cell-boundary caveat).
    *
    * Closed form instead of the textbook bisection loop: the geohash's
    * interleaved bits ARE the fixed-point binary expansions of
    * (lon+180)/360 and (lat+90)/180, so ilon/ilat are one scale+floor
    * each (clamped so lon=180/lat=90 land in the top cell), and the
    * interleave/base32 steps unroll to a fixed integer expression tree
    * (lon holds the even bit positions from the MSB — lon first, per
    * the spec). Everything after the two floors is exact integer
    * arithmetic, bit-replayable in any engine. */
  def geohash(lat: Column, lon: Column, precision: Int): Column = {
    val (iLat, iLon) = cellInts(lat, lon, precision)
    encodeCells(iLat, iLon, precision)
  }

  /** The 3×3 cell neighborhood of (lat, lon)'s geohash at `precision`,
    * self included — the blocking-key array for geohash-prefix joins
    * (each side explodes/joins on one cell; radius ≤ one cell width is
    * then provably covered). Longitude cells WRAP (antimeridian
    * neighbors are real neighbors); latitude cells CLAMP at the poles,
    * and the resulting duplicates collapse via array_distinct, so the
    * array has 9 entries in the interior and 6 on a pole edge. */
  def geohashNeighbors(lat: Column, lon: Column, precision: Int): Column = {
    val (iLat, iLon) = cellInts(lat, lon, precision)
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits - lonBits
    val cells = for (dy <- Seq(-1L, 0L, 1L); dx <- Seq(-1L, 0L, 1L))
      yield encodeCells(
        least(lit((1L << latBits) - 1), greatest(lit(0L), iLat + dy)),
        pmod(iLon + dx, lit(1L << lonBits)), precision)
    array_distinct(array(cells: _*))
  }

  /** Decode a geohash string back to its cell CENTER (lat, lon) as a
    * struct<lat:double, lon:double> — the inverse of [[geohash]] up to
    * cell resolution (encode(decode(h)) == h for every valid hash).
    * De-interleaves by summing per-character base32 digits (found via
    * one locate() per char — no UDF) into iLat/iLon, then
    * center = ((2·i + 1)/2) / 2^bits · range − offset, one float chain.
    * `precision` must match the string's length. */
  def geohashDecode(hash: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12], got $precision")
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits - lonBits
    // interleaved long from the chars: digit(c) << 5*(p-1-c), digit via
    // a 1-based locate into the base32 alphabet (builtin, codegen'd)
    val inter = (0 until precision).map { c =>
      val digit = (call_function("locate",
        substring(hash, c + 1, 1), lit(Base32)) - 1).cast("long")
      shiftleft(digit, 5 * (precision - 1 - c))
    }.reduce(_ + _)
    // de-interleave: lon holds even positions from the MSB, lat odd
    def unpick(even: Boolean, bits: Int): Column =
      (0 until bits).map { idx =>
        val i = if (even) 2 * idx else 2 * idx + 1 // interleaved position
        val bit = shiftright(inter, totalBits - 1 - i).bitwiseAND(lit(1L))
        shiftleft(bit, bits - 1 - idx)
      }.reduce(_ + _)
    val iLon = unpick(even = true, lonBits)
    val iLat = unpick(even = false, latBits)
    def center(i: Column, bits: Int, range: Double, offset: Double): Column =
      ((i * 2L + 1L).cast("double") / 2.0) /
        (1L << bits).toDouble * range - offset
    struct(center(iLat, latBits, 180.0, 90.0).as("lat"),
      center(iLon, lonBits, 360.0, 180.0).as("lon"))
  }

  /** (iLat, iLon) cell integers at `precision` — the fixed-point binary
    * expansions geohash interleaves (see [[geohash]]). */
  private def cellInts(lat: Column, lon: Column,
      precision: Int): (Column, Column) = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12], got $precision")
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2 // lon first => lon gets the extra bit
    val latBits = totalBits - lonBits
    def scaled(v: Column, offset: Double, range: Double, bits: Int): Column =
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((v + offset) / range * (1L << bits).toDouble).cast("long")))
    (scaled(lat, 90.0, 180.0, latBits), scaled(lon, 180.0, 360.0, lonBits))
  }

  /** Interleave + base32-encode cell integers (lon holds the even bit
    * positions from the MSB — lon first, per the spec). Everything is
    * exact integer arithmetic, bit-replayable in any engine. */
  private def encodeCells(iLat: Column, iLon: Column,
      precision: Int): Column = {
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits - lonBits
    // interleaved(i) for i=0..totalBits-1 from the MSB: even i from lon,
    // odd from lat; accumulate into one long
    val inter = (0 until totalBits).map { i =>
      val (src, srcBits, idx) =
        if (i % 2 == 0) (iLon, lonBits, i / 2) else (iLat, latBits, i / 2)
      val bit = shiftright(src, srcBits - 1 - idx).bitwiseAND(lit(1L))
      shiftleft(bit, totalBits - 1 - i)
    }.reduce(_ + _)
    concat((0 until precision).map { c =>
      val idx = shiftright(inter, 5 * (precision - 1 - c))
        .bitwiseAND(lit(31L)).cast("int")
      element_at(typedLit(Base32.map(_.toString)), idx + 1)
    }: _*)
  }
}
