package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluate, Quality}

/** Exact autocorrelation over the dense bucket grid, and the
  * k-anonymity / l-diversity privacy profile. */
class AcfAnonymitySpec extends SparkSuite {
  import spark.implicits._

  /** In-memory ACF reference over the materialized count series. */
  private def refAcf(counts: Seq[Long], maxLag: Int): Map[Long, (Long, Long)] = {
    val t = counts.size.toLong
    val s = counts.sum
    val dev = counts.map(x => t * x - s)
    val den = dev.map(d => d * d).sum
    (1 to maxLag).flatMap { l =>
      if (l >= counts.size) None
      else Some(l.toLong ->
        ((0 until counts.size - l).map(i => dev(i) * dev(i + l)).sum, den))
    }.toMap
  }

  private def runAcf(rows: Seq[(String, Long)], maxLag: Int) =
    Evaluate.autocorrelation(rows.toDF("g", "b").repartition(5),
        Seq("g"), col("b"), maxLag)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDecimal(2).longValueExact, r.getDecimal(3).longValueExact,
          if (r.isNullAt(6)) Double.NaN else r.getDouble(6)))).toMap

  test("period-2 series: negative lag-1, positive lag-2, exact integers") {
    // span 0..6 -> T=7; counts: 4,0,4,0,4,0,4; S=16; dev = 7x-16
    val rows = (0L until 8L by 2).flatMap(b => Seq.fill(4)(("A", b)))
    val out = runAcf(rows, 2)
    // dev: [12,-16,12,-16,12,-16,12]; den = 4*144 + 3*256 = 1344
    assert(out(("A", 1L))._1 === -1152L) // 6 * (12 * -16)
    assert(out(("A", 2L))._1 === 944L)   // 3*144 + 2*256
    assert(out(("A", 1L))._2 === 1344L)
    assert(math.abs(out(("A", 1L))._3 - (-1152.0 / 1344.0)) < 1e-12)
    assert(math.abs(out(("A", 2L))._3 - (944.0 / 1344.0)) < 1e-12)
  }

  test("reference parity on a pseudo-random series with gap days") {
    // buckets 0..19, day d gets (d*7 % 5) events; days 3 and 11 get 0
    val counts = (0 until 20).map(d =>
      if (d == 3 || d == 11) 0L else (d * 7 % 5).toLong)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      Seq.fill(n.toInt)(("A", d.toLong)) }
    // keep the span anchored even though day 0 count may be 0
    val anchored = if (counts.head == 0L) ("A", 0L) +: rows else rows
    val adj = if (counts.head == 0L) counts.updated(0, 1L) else counts
    val out = runAcf(anchored, 6)
    val want = refAcf(adj, 6)
    for ((l, (num, den)) <- want) {
      assert(out(("A", l))._1 === num, s"num lag $l")
      assert(out(("A", l))._2 === den, s"den lag $l")
    }
  }

  test("constant series: zero deviations, null acf") {
    val rows = (0L until 6L).flatMap(b => Seq.fill(3)(("A", b)))
    val out = runAcf(rows, 2)
    assert(out(("A", 1L))._1 === 0L && out(("A", 1L))._2 === 0L)
    assert(out(("A", 1L))._3.isNaN)
  }

  test("lags at or beyond the series length are absent") {
    val rows = Seq(("A", 0L), ("A", 1L), ("A", 2L))
    val out = runAcf(rows, 10)
    assert(out.keys.map(_._2).toSet === Set(1L, 2L))
  }

  test("holtForecast: in-memory fold parity, single bucket, linear trend") {
    def refHolt(xs: Seq[Double], a: Double, b: Double): (Double, Double) =
      xs.tail.foldLeft((xs.head, 0.0)) { case ((l, t), x) =>
        val l2 = a * x + (1 - a) * (l + t)
        (l2, b * (l2 - l) + (1 - b) * t)
      }
    val counts = Seq(3L, 0L, 5L, 2L, 7L, 0L, 4L)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      Seq.fill(n.toInt)(("A", d.toLong)) }
    val out = Evaluate.holtForecast(rows.toDF("g", "b").repartition(4),
        Seq("g"), col("b"), alpha = 0.5, beta = 0.25, horizons = Seq(1, 3))
      .head
    val (l, t) = refHolt(counts.map(_.toDouble), 0.5, 0.25)
    assert(out.getLong(1) === 7L)
    assert(out.getDouble(2) === l && out.getDouble(3) === t)
    assert(out.getDouble(4) === l + 1.0 * t)
    assert(out.getDouble(5) === l + 3.0 * t)

    // single bucket: level = x1, trend = 0
    val one = Evaluate.holtForecast(Seq(("B", 5L), ("B", 5L))
        .toDF("g", "b"), Seq("g"), col("b")).head
    assert(one.getLong(1) === 1L && one.getDouble(2) === 2.0 &&
      one.getDouble(3) === 0.0)

    // steadily rising series: positive trend, fc_7 > level
    val rising = (0L until 10L).flatMap(d =>
      Seq.fill((d + 1).toInt)(("C", d)))
    val r = Evaluate.holtForecast(rising.toDF("g", "b"), Seq("g"),
      col("b"), horizons = Seq(7)).head
    assert(r.getDouble(3) > 0.5)
    assert(r.getDouble(4) > r.getDouble(2))
  }

  test("seasonalIndex: exact phase ratios, flat series = 1e6, zero days count") {
    // period 3 over 6 buckets: phases {0,3},{1,4},{2,5}
    // counts: 4,1,1,4,1,1 -> phase0 sum 8 (n 2), others 2 -> T=6, S=12
    val rows = Seq(0L -> 4, 1L -> 1, 2L -> 1, 3L -> 4, 4L -> 1, 5L -> 1)
      .flatMap { case (b, n) => Seq.fill(n)(("A", b)) }
    val out = Evaluate.seasonalIndex(rows.toDF("g", "b").repartition(3),
        Seq("g"), col("b"), period = 3)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out(0L) === ((2L, 8L, 2000000L))) // (8*6*1e6) div (2*12)
    assert(out(1L) === ((2L, 2L, 500000L)))
    assert(out(2L) === ((2L, 2L, 500000L)))
    // flat series: every phase exactly 1e6
    val flat = (0L until 9L).map(b => ("B", b))
    val f = Evaluate.seasonalIndex(flat.toDF("g", "b"), Seq("g"),
        col("b"), period = 3)
      .collect().map(_.getLong(4)).toSet
    assert(f === Set(1000000L))
  }

  test("theilSen: hand slopes, outlier robustness, single-bucket group absent") {
    // perfect line y = 2x over 5 buckets -> slope exactly 2, intercept 0
    val line = (0L until 5L).flatMap(b => Seq.fill((2 * b).toInt)(("A", b))) ++
      Seq(("A", 0L)) // keep bucket 0 populated in the span (y0 = 1)
    // A: counts 1,2,4,6,8 -- not a perfect line; use B as the clean one
    val clean = (0L until 5L).flatMap(b => Seq.fill((2 * b + 1).toInt)(("B", b)))
    val out = Evaluate.theilSen((line ++ clean).toDF("g", "b"),
        Seq("g"), col("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // B: y = 2i + 1 exactly -> all pairwise slopes 2, residuals all 1
    assert(out("B") === ((10L, 2.0, 1.0)))
    // A: counts 1,2,4,6,8 -> median slope still near 2 despite the kink
    assert(math.abs(out("A")._2 - 2.0) <= 0.5)
  }

  test("olsTrend: exact normal equations on a hand line, T=1 null slope") {
    // y = 3i + 1 over i = 0..3 (counts 1,4,7,10)
    val rows = (0L until 4L).flatMap(b =>
      Seq.fill((3 * b + 1).toInt)(("A", b)))
    val out = Evaluate.olsTrend(rows.toDF("g", "b").repartition(3),
      Seq("g"), col("b")).head
    // n=4, si=6, sy=22, sxy=48, sxx=14: num=4*48-132=60, den=56-36=20
    assert(out.getLong(1) === 4L)
    assert(out.getLong(2) === 60L && out.getLong(3) === 20L)
    assert(out.getDouble(4) === 3.0)
    assert(out.getDouble(5) === 1.0)
    // single bucket: den 0 -> null slope
    val one = Evaluate.olsTrend(Seq(("B", 2L), ("B", 2L)).toDF("g", "b"),
      Seq("g"), col("b")).head
    assert(one.getLong(3) === 0L && one.isNullAt(4))
  }

  test("mannKendall: hand S with ties, variance correction, z signs") {
    // counts 1,2,2,4 over buckets 0..3: pairs (i<j) signs:
    // (1,2)+ (1,2)+ (1,4)+ (2,2)0 (2,4)+ (2,4)+ -> S = 5
    val rows = Seq(0L -> 1, 1L -> 2, 2L -> 2, 3L -> 4)
      .flatMap { case (b, n) => Seq.fill(n)(("A", b)) }
    val out = Evaluate.mannKendall(rows.toDF("g", "b").repartition(3),
      Seq("g"), col("b")).head
    assert(out.getLong(1) === 4L && out.getLong(2) === 5L)
    // var18 = 4*3*13 - 2*1*9 = 156 - 18 = 138
    assert(out.getLong(3) === 138L)
    val wantZ = (5.0 - 1.0) / math.sqrt(138.0 / 18.0)
    assert(math.abs(out.getDouble(4) - wantZ) < 1e-12)
    // strictly decreasing -> negative z with the +1 correction
    val dec = (0L until 5L).flatMap(b => Seq.fill((5 - b).toInt)(("B", b)))
    val d = Evaluate.mannKendall(dec.toDF("g", "b"), Seq("g"),
      col("b")).head
    assert(d.getLong(2) === -10L) // all 10 pairs decreasing
    assert(d.getDouble(4) < -2.0)
    // constant series: S = 0, z = 0... but all-tie var18 = 0 -> null
    val const = (0L until 4L).flatMap(b => Seq.fill(3)(("C", b)))
    val c = Evaluate.mannKendall(const.toDF("g", "b"), Seq("g"),
      col("b")).head
    assert(c.getLong(2) === 0L && c.getLong(3) === 0L && c.isNullAt(4))
  }

  test("kAnonymityGroups: sizes, risk flags, null cohort, l-diversity") {
    val df = Seq(
      ("m", Some(1), "a"), ("m", Some(1), "a"), ("m", Some(1), "b"),
      ("f", Some(1), "a"), ("f", Some(1), "a"),
      ("m", None, "c")
    ).toDF("seg", "nat", "sens")
    val out = Quality.kAnonymityGroups(df, Seq("seg", "nat"), k = 3,
        sensitiveCol = Some("sens"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out(("m", 1)) === ((3L, 2L, 0)))  // big enough, 2 sens values
    assert(out(("f", 1)) === ((2L, 1L, 1)))  // small AND sens-uniform
    assert(out(("m", -1)) === ((1L, 1L, 1))) // null QI is its own cohort
  }

  test("kAnonymity summary: row/group tallies and the min cohort") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2), ("b", 2), ("c", 3))
      .toDF("q1", "q2")
    val r = Quality.kAnonymity(df, Seq("q1", "q2"), k = 3).head
    assert(r.getLong(0) === 6L) // n_rows
    assert(r.getLong(1) === 3L) // n_groups
    assert(r.getLong(2) === 3L) // at_risk_rows (2 + 1)
    assert(r.getLong(3) === 2L) // at_risk_groups
    assert(r.getLong(4) === 1L) // k_anonymity
  }
}
