package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluate, Graph}

/** Isotonic (PAV-by-minimax) calibration + graph feature smoothing:
  * hand cases, the PAV sequential-pooling reference, monotonicity,
  * valves, isolated-node rules. */
class IsotonicSpec extends SparkSuite {
  import spark.implicits._

  /** classic PAV: sequential pooling reference implementation */
  private def pavRef(buckets: Seq[(Long, Long, Long)]): Seq[Double] = {
    // stack of (num, den)
    val st = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    for ((_, n, k) <- buckets) {
      var blk = (k, n, 1)
      while (st.nonEmpty &&
          st.last._1 * blk._2 >= blk._1 * st.last._2) { // prev mean >= cur
        val p = st.remove(st.length - 1)
        blk = (p._1 + blk._1, p._2 + blk._2, p._3 + blk._3)
      }
      st += blk
    }
    st.flatMap { case (k, n, c) =>
      Seq.fill(c)(k.toDouble / n.toDouble) }.toSeq
  }

  test("isotonicFit equals sequential PAV on a violating sequence") {
    // buckets (score, y) engineered to force pooling: 0.1->1, 0.2->0 ...
    val rows = Seq(
      (0.01, true), (0.01, true),          // bucket 1: 2/2
      (0.02, false),                       // bucket 2: 0/1  (violates)
      (0.03, true), (0.03, false),         // bucket 3: 1/2
      (0.04, true),                        // bucket 4: 1/1
      (0.05, false), (0.05, false))        // bucket 5: 0/2  (violates)
    val df = rows.toDF("s", "y")
    val got = Evaluate.isotonicFit(df, col("s"), col("y"),
        quantScale = 100L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    val grid = got.map(g => (g._1, g._2, g._3)).toSeq
    val want = pavRef(grid)
    got.map(_._4).zip(want).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"$a vs $b") }
    // fit is monotone non-decreasing
    val fits = got.map(_._4)
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b })
    // exact rationals agree with the fit double
    val r0 = Evaluate.isotonicFit(df, col("s"), col("y"), 100L)
      .orderBy("bucket").collect()
    r0.foreach(r => assert(
      r.getDouble(5) == r.getLong(3).toDouble / r.getLong(4).toDouble))
  }

  test("isotonicFit agrees with the driver-side isotonicCalibrate twin") {
    // scores at bin centers so floor-binning (calibrate, nBins=10) and
    // round-quantization (fit, quantScale=10) group identically
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { _ =>
      val b = rnd.nextInt(10)
      val s = b / 10.0 + 0.05
      // non-monotone positive rate forces pooling
      val p = rnd.nextDouble() < (if (b % 3 == 0) 0.8 - b * 0.05
        else 0.1 + b * 0.07)
      (s, p)
    }
    val df = rows.toDF("s", "y")
    val viaCalibrate = Evaluate.isotonicCalibrate(df, col("s"), col("y"),
        nBins = 10)
      .orderBy("bin").collect().map(_.getDouble(5)).toSeq
    val viaFit = Evaluate.isotonicFit(df, col("s"), col("y"),
        quantScale = 10L)
      .orderBy("bucket").collect().map(_.getDouble(5)).toSeq
    assert(viaCalibrate.size == viaFit.size)
    viaCalibrate.zip(viaFit).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"$a vs $b") }
  }

  test("isotonicFit: already-monotone data is a fixed point") {
    val df = Seq((0.1, false), (0.2, false), (0.3, true), (0.4, true))
      .toDF("s", "y")
    val got = Evaluate.isotonicFit(df, col("s"), col("y"), 10L)
      .orderBy("bucket").collect().map(_.getDouble(5)).toSeq
    assert(got == Seq(0.0, 0.0, 1.0, 1.0))
  }

  test("isotonicFit refuses an over-bound grid loudly; layout-invariant") {
    val big = spark.range(1000).select(
      (col("id").cast("double") / 10.0).as("s"),
      (col("id") % 2 === 0).as("y"))
    val e = intercept[Exception] {
      Evaluate.isotonicFit(big, col("s"), col("y"),
        quantScale = 10L, maxBuckets = 50).collect()
    }
    assert(e.getMessage.contains("maxBuckets"))
    val base = Seq((0.1, true), (0.2, false), (0.3, true)).toDF("s", "y")
    val a = Evaluate.isotonicFit(base, col("s"), col("y"), 10L)
      .collect().toSet
    val b = Evaluate.isotonicFit(base.repartition(5), col("s"), col("y"),
      10L).collect().toSet
    assert(a == b)
  }

  test("featureSmoothPpm: path-graph hand case, isolated holds value") {
    // path 1-2-3, isolated 9; x0 = (0, 6e6, 12e6, 5e6)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val feats = Seq((1L, 0L), (2L, 6000000L), (3L, 12000000L),
      (9L, 5000000L)).toDF("id", "f")
    val r1 = Graph.featureSmoothPpm(pairs, feats, "id", col("f"),
        rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // x1(1)=x0(2)=6e6; x1(2)=(0+12e6)/2=6e6; x1(3)=x0(2)=6e6; 9 holds
    assert(r1 == Map(1L -> 6000000L, 2L -> 6000000L, 3L -> 6000000L,
      9L -> 5000000L))
    // floor division is exact integer: odd sum over degree 2
    val feats2 = Seq((1L, 1L), (2L, 0L), (3L, 2L)).toDF("id", "f")
    val r2 = Graph.featureSmoothPpm(pairs, feats2, "id", col("f"), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(2L) == 1L) // (1+2) div 2
  }
}
