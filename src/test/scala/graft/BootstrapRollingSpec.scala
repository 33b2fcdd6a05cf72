package graft

import org.apache.spark.sql.functions._

import graft.operators.Evaluate

/** Poisson bootstrap (deterministic inverse-CDF weights) and rolling
  * window aggregates over the dense grid. */
class BootstrapRollingSpec extends SparkSuite {
  import spark.implicits._

  test("poissonBootstrap: weights average ~1, runs are deterministic") {
    val df = (0L until 2000L).map(i => (i, 1000000L)).toDF("id", "v")
    val out = Evaluate.poissonBootstrap(df, col("id"), col("v"),
      reps = 4, seed = 7L).collect()
    assert(out.length === 4)
    out.foreach { r =>
      val nSrc = r.getAs[Long]("n_src")
      val nEff = r.getAs[Long]("n_eff")
      assert(nSrc === 2000L)
      // Poisson(1) weights: Σw concentrates hard around n (sd ~ √n ≈ 45)
      assert(nEff > 1800L && nEff < 2200L, s"n_eff $nEff out of band")
      // constant value: wsum must be exactly v * n_eff
      assert(r.getAs[Long]("wsum") === 1000000L * nEff)
    }
    val again = Evaluate.poissonBootstrap(df.repartition(7), col("id"),
      col("v"), reps = 4, seed = 7L).collect()
    assert(out.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("poissonBootstrap: replicates differ and seeds differ") {
    val df = (0L until 500L).map(i => (i, i * 1000L)).toDF("id", "v")
    val a = Evaluate.poissonBootstrap(df, col("id"), col("v"), reps = 8)
      .select("n_eff").as[Long].collect().toSet
    assert(a.size > 1, "all replicates drew identical weights")
    val b = Evaluate.poissonBootstrap(df, col("id"), col("v"), reps = 8,
      seed = 99L).select("wsum").as[Long].collect().toSeq
    val b0 = Evaluate.poissonBootstrap(df, col("id"), col("v"), reps = 8)
      .select("wsum").as[Long].collect().toSeq
    assert(b != b0, "seed had no effect")
  }

  test("poissonBootstrap: out-of-range key refuses loudly") {
    val df = Seq((-1L, 5L)).toDF("id", "v")
    val e = intercept[Exception] {
      Evaluate.poissonBootstrap(df, col("id"), col("v"), reps = 4).collect()
    }
    assert(e.getMessage.contains("poissonBootstrap key out of range"))
  }

  test("bootstrapSe: hand means 1,2,3 -> grand 2, se 1") {
    val reps = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("rep", "mean")
    val r = Evaluate.bootstrapSe(reps).head
    assert(r.getAs[Long]("b_used") === 3L)
    assert(math.abs(r.getAs[Double]("grand_mean") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_boot") - 1.0) < 1e-12)
  }

  test("bootstrapSe over real draws lands near sd/sqrt(n)") {
    // values uniform over 0..1e6 ppm: sd ≈ 288675, se ≈ sd/√n ≈ 9129
    val n = 1000L
    val df = (0L until n).map(i => (i, (i * 997L) % 1000001L)).toDF("id", "v")
    val se = Evaluate.bootstrapSe(
        Evaluate.poissonBootstrap(df, col("id"), col("v"), reps = 32))
      .head.getAs[Double]("se_boot")
    assert(se > 3000 && se < 27000, s"se_boot $se implausible")
  }

  test("rollingCounts: gaps zero-fill, trailing window ramps") {
    // one group, events on days 0 (x2), 1 (x1), 3 (x5); day 2 is a gap
    val ev = Seq(("g", 0L), ("g", 0L), ("g", 1L), ("g", 3L), ("g", 3L),
      ("g", 3L), ("g", 3L), ("g", 3L)).toDF("g", "day")
    val got = Evaluate.rollingCounts(ev, Seq("g"), col("day"), window = 2)
      .orderBy("bucket")
      .select("bucket", "cnt", "win_n", "win_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(
      (0L, 2L, 1L, 2L), // head: window not yet full
      (1L, 1L, 2L, 3L),
      (2L, 0L, 2L, 1L), // the gap day participates as 0
      (3L, 5L, 2L, 5L)))
  }

  test("rollingCounts: window=1 degenerates to the per-bucket count") {
    val ev = Seq(("a", 0L), ("a", 2L), ("b", 1L)).toDF("g", "day")
    val got = Evaluate.rollingCounts(ev, Seq("g"), col("day"), window = 1)
    assert(got.where(col("win_sum") =!= col("cnt")).count() === 0)
    assert(got.where(col("win_n") =!= 1).count() === 0)
  }

  test("kaplanMeier: textbook hand case with censoring") {
    // (t,e): (1,1) (2,0) (3,1) (3,1) (4,0)
    val d = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L), (4L, 0L))
      .map { case (t, e) => ("g", t, e) }.toDF("grp", "t", "e")
    val got = Evaluate.kaplanMeier(d, Seq("grp"), col("t"), col("e"))
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(got.map(x => (x._1, x._2, x._3, x._4)).toSeq ==
      Seq((1L, 5L, 1L, 0L), (2L, 4L, 0L, 1L), (3L, 3L, 2L, 0L),
        (4L, 1L, 0L, 1L)))
    val s = got.map(_._5)
    assert(math.abs(s(0) - 0.8) < 1e-12)
    assert(math.abs(s(1) - 0.8) < 1e-12) // censoring alone never drops S
    assert(math.abs(s(2) - 0.8 / 3) < 1e-12)
    assert(math.abs(s(3) - 0.8 / 3) < 1e-12)
  }

  test("olsDummyPoints: exact recovery of a planted linear+dummy model") {
    // y = 2 + 3x + 7f, residual-free -> Cramer solves it exactly
    val pts = (0L until 40L).map { x =>
      val f = (x * 13) % 3 match { case 0 => 1L; case _ => 0L }
      ("g", x, f, 2L + 3 * x + 7 * f)
    }.toDF("grp", "x", "f", "y")
    val r = Evaluate.olsDummyPoints(pts, Seq("grp"), col("x"), col("f"),
      col("y")).head
    assert(math.abs(r.getAs[Double]("b0") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") - 7.0) < 1e-9)
    // layout invariance of the exact integer columns
    val again = Evaluate.olsDummyPoints(pts.repartition(7), Seq("grp"),
      col("x"), col("f"), col("y")).head
    assert(again.getAs[java.math.BigDecimal]("det") ==
      r.getAs[java.math.BigDecimal]("det"))
    assert(again.getAs[java.math.BigDecimal]("nb1") ==
      r.getAs[java.math.BigDecimal]("nb1"))
  }

  test("olsDummyPoints: singular designs yield nulls; |x| guard refuses") {
    // f constant -> f column collinear with intercept -> det = 0
    val flat = (0L until 10L).map(x => ("g", x, 1L, x)).toDF("grp", "x", "f", "y")
    val r = Evaluate.olsDummyPoints(flat, Seq("grp"), col("x"), col("f"),
      col("y")).head
    assert(r.getAs[java.math.BigDecimal]("det").longValue === 0L)
    assert(r.isNullAt(r.fieldIndex("b1")))
    val wide = Seq(("g", 40000L, 0L, 1L)).toDF("grp", "x", "f", "y")
    val ex = intercept[Exception] {
      Evaluate.olsDummyPoints(wide, Seq("grp"), col("x"), col("f"),
        col("y")).collect()
    }
    assert(ex.getMessage.contains("olsDummyPoints needs |x| < 32768"))
  }

  test("kaplanMeier: no censoring equals the empirical survivor; invariance") {
    val d = (1L to 20L).map(i => ("g", i % 5, 1L)).toDF("grp", "t", "e")
    val got = Evaluate.kaplanMeier(d, Seq("grp"), col("t"), col("e"))
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getDouble(5)))
    // uniform over t=0..4, 4 each: S(t) = (16-4t)/20
    got.foreach { case (t, s) =>
      assert(math.abs(s - (16.0 - 4 * t) / 20.0) < 1e-12, s"t=$t s=$s") }
    val again = Evaluate.kaplanMeier(d.repartition(7), Seq("grp"),
      col("t"), col("e")).orderBy("t").collect()
      .map(r => (r.getLong(1), r.getDouble(5)))
    assert(again.toSeq == got.toSeq)
  }

  test("interpolateLinear: exact observed, hand interpolation, no extrapolation, group isolation") {
    val df = Seq(("a", 1L, 10.0), ("a", 4L, 40.0), ("a", 4L, 5.0),
      ("a", 6L, 0.0), ("b", 2L, 7.0)).toDF("g", "b", "v")
    val got = Evaluate.interpolateLinear(df, Seq("g"), col("b"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getBoolean(2), r.getLong(3))).toMap
    // duplicate-bucket rows sum: b=4 -> 45
    assert(got(("a", 4L)) == ((true, 45000000L)))
    assert(got(("a", 1L)) == ((true, 10000000L)))
    // gap 2,3 between (1,10) and (4,45): 10 + (v diff 35)*(t/3)
    assert(got(("a", 2L)) == ((false, math.round((10.0 * 2 + 45.0 * 1) / 3.0 * 1e6))))
    assert(got(("a", 3L)) == ((false, math.round((10.0 * 1 + 45.0 * 2) / 3.0 * 1e6))))
    // gap 5 between (4,45) and (6,0)
    assert(got(("a", 5L)) == ((false, math.round(45.0 / 2.0 * 1e6))))
    // no extrapolation: group a grid stops at [1,6]; b is a single point
    assert(!got.contains(("a", 0L)) && !got.contains(("a", 7L)))
    assert(got(("b", 2L)) == ((true, 7000000L)) &&
      got.keys.count(_._1 == "b") == 1)
  }

  test("ewma: hand recurrence, zero-filled gaps decay, alpha=1 tracks exactly, layout-proof") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 4L, 8.0))
      .toDF("g", "b", "v")
    val got = Evaluate.ewma(df, Seq("g"), col("b"), col("v"), alpha = 0.5)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // s1=10, s2=.5*20+.5*10=15, s3(gap, v=0)=7.5, s4=.5*8+.5*7.5=7.75
    assert(got(1L) == ((10000000L, 10000000L)))
    assert(got(2L) == ((20000000L, 15000000L)))
    assert(got(3L) == ((0L, 7500000L)))
    assert(got(4L) == ((8000000L, 7750000L)))
    // alpha = 1: the smoother IS the series
    val track = Evaluate.ewma(df, Seq("g"), col("b"), col("v"), alpha = 1.0)
      .collect().map(r => r.getLong(2) -> r.getLong(3))
    assert(track.forall { case (v, s) => v == s })
    // layout invariance (fold rides a sorted collected array)
    val got7 = Evaluate.ewma(df.repartition(7), Seq("g"), col("b"),
        col("v"), alpha = 0.5)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got7 == got)
  }

  test("crossCorrelation: shifted signal peaks at its lag, antisymmetric swap, constant null") {
    // y is x delayed by one bucket -> perfect r at lag +1, weaker at 0
    val df = Seq((1L, 1.0, 0.0), (2L, 5.0, 1.0), (3L, 2.0, 5.0),
      (4L, 7.0, 2.0)).map { case (b, x, y) => ("g", b, x, y) }
      .toDF("g", "b", "x", "y")
    val r = Evaluate.crossCorrelation(df, Seq("g"), col("b"), col("x"),
        col("y"), maxLag = 2)
      .collect().map(x => x.getLong(1) -> (x.getLong(2),
        if (x.isNullAt(3)) Double.NaN else x.getDouble(3))).toMap
    assert(r.size == 5 && r(1L)._1 == 3L)
    assert(math.abs(r(1L)._2 - 1.0) < 1e-12)
    assert(r(0L)._2 < 0.9)
    // swapping the signals mirrors the lag axis
    val sw = Evaluate.crossCorrelation(df, Seq("g"), col("b"), col("y"),
        col("x"), maxLag = 2)
      .collect().map(x => x.getLong(1) ->
        (if (x.isNullAt(3)) Double.NaN else x.getDouble(3))).toMap
    assert(math.abs(sw(-1L) - r(1L)._2) < 1e-12)
    // constant y: zero variance -> null r at every lag
    val const = Evaluate.crossCorrelation(df, Seq("g"), col("b"),
      col("x"), lit(3.0), maxLag = 1)
    assert(const.collect().forall(_.isNullAt(3)))
  }
}
