package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluate, Pack}

/** r7 additions, third wave: multiplicity control (BH-FDR), causal
  * contrasts (diff-in-diff, uplift/Qini), conformal calibration, WOE/IV,
  * and the padding-waste packing study — textbook hand cases, edge
  * conventions, layout invariance. */
class CausalEvalSpec extends SparkSuite {
  import spark.implicits._

  // ---- bhAdjust -------------------------------------------------------

  test("bhAdjust: textbook step-up — middle rank rescued by a later pass") {
    // m = 4, alpha = 0.25 (250_000_000 ppb). p = .01, .04, .20, .90.
    // thresholds k*alpha/m: .0625, .125, .1875, .25 -> pass at ranks 1, 2;
    // rank 3 (.20 > .1875) fails and nothing after passes -> reject 1, 2.
    val p = Seq(("a", 10000000L), ("b", 40000000L), ("c", 200000000L),
      ("d", 900000000L)).toDF("id", "p_ppb")
    val out = Evaluate.bhAdjust(p, col("id"), col("p_ppb"), 250000000L)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[String]("test_id")).toSeq == Seq("a", "b", "c", "d"))
    assert(out.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, true, false, false))
    // q-values: suffix min of p*m/k (floor-ppb): raw = .04, .08, .2666.., .9
    assert(out.map(_.getAs[Long]("q_ppb")).toSeq ==
      Seq(40000000L, 80000000L, 266666666L, 900000000L))
  }

  test("bhAdjust: step-up rescues an early fail via a later pass") {
    // m = 2, alpha = 0.5: p = .30, .45. rank1 threshold .25 -> fail;
    // rank2 threshold .5 -> pass -> BOTH reject (the step-up property).
    val p = Seq(("a", 300000000L), ("b", 450000000L)).toDF("id", "p_ppb")
    val out = Evaluate.bhAdjust(p, col("id"), col("p_ppb"), 500000000L)
      .orderBy("rank").collect()
    assert(out.forall(_.getAs[Boolean]("reject")))
  }

  test("bhAdjust: q capped at 1e9, p guard refuses out-of-range") {
    val p = Seq(("a", 900000000L), ("b", 1000000000L)).toDF("id", "p_ppb")
    val out = Evaluate.bhAdjust(p, col("id"), col("p_ppb"), 50000000L)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("q_ppb")).forall(_ <= 1000000000L))
    val bad = Seq(("a", -1L)).toDF("id", "p_ppb")
    intercept[Exception] {
      Evaluate.bhAdjust(bad, col("id"), col("p_ppb"), 50000000L).collect()
    }
  }

  // ---- diffInDiff -----------------------------------------------------

  test("diffInDiff: hand 2x2 — parallel-trends deviation isolated") {
    // control moves 10 -> 12 (+2); treated moves 20 -> 30 (+10);
    // did = 10 - 2 = 8.
    val rows = Seq(
      (true, false, 20L), (true, false, 20L),
      (true, true, 30L), (true, true, 30L),
      (false, false, 10L), (false, true, 12L))
      .toDF("t", "p", "v")
    val r = Evaluate.diffInDiff(rows, col("t"), col("p"), col("v"))
      .collect().head
    assert(r.getAs[Long]("n_t1") == 2L && r.getAs[Long]("s_t1") == 60L)
    assert(math.abs(r.getAs[Double]("did") - 8.0) < 1e-12)
  }

  test("diffInDiff: any empty cell -> null estimate") {
    val rows = Seq((true, true, 5L), (false, true, 1L), (false, false, 1L))
      .toDF("t", "p", "v")
    val r = Evaluate.diffInDiff(rows, col("t"), col("p"), col("v"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("did")))
  }

  // ---- upliftBins -----------------------------------------------------

  test("upliftBins: hand two-bin case — uplift and qini exact") {
    // 4 rows, 2 bins. Top bin (scores 10, 9): treated converts, control
    // doesn't -> uplift 1.0, qini = 1 - 0*(1/1) = 1.
    // Bottom bin (2, 1): neither converts -> uplift 0.
    val rows = Seq(
      (1L, 10.0, true, true), (2L, 9.0, false, false),
      (3L, 2.0, true, false), (4L, 1.0, false, false))
      .toDF("k", "s", "tr", "pos")
    val out = Evaluate.upliftBins(rows, col("s"), col("tr"), col("pos"),
        col("k"), nBins = 2)
      .orderBy("bin").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_t") == 1L && out(0).getAs[Long]("pos_t") == 1L)
    assert(math.abs(out(0).getAs[Double]("uplift") - 1.0) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("qini") - 1.0) < 1e-12)
    assert(out(1).getAs[Double]("uplift") == 0.0)
    assert(out(1).getAs[Long]("cum_n_t") == 2L)
  }

  test("upliftBins: layout invariance") {
    val rows = (1 to 400).map(i =>
      (i.toLong, (i * 37 % 101).toDouble, i % 2 == 0, i % 5 == 0))
      .toDF("k", "s", "tr", "pos")
    val a = Evaluate.upliftBins(rows, col("s"), col("tr"), col("pos"),
      col("k")).orderBy("bin").collect().toSeq
    val b = Evaluate.upliftBins(rows.repartition(13), col("s"), col("tr"),
      col("pos"), col("k")).orderBy("bin").collect().toSeq
    assert(a == b)
  }

  // ---- conformalSplit -------------------------------------------------

  test("conformalSplit: k-th smallest off the grid, exact coverage") {
    // 9 calibration scores 1..9, alpha = 0.1: k = ceil(10*0.9) = 9 ->
    // threshold = 9. Eval 5, 9, 10 -> covered 2/3.
    val rows = (1L to 9L).map(v => (v, true)) ++
      Seq((5L, false), (9L, false), (10L, false))
    val df = rows.toDF("s", "cal")
    val r = Evaluate.conformalSplit(df, col("s"), col("cal"), 100000L)
      .collect().head
    assert(r.getAs[Long]("n_cal") == 9L && r.getAs[Long]("k") == 9L)
    assert(r.getAs[Long]("threshold") == 9L)
    assert(r.getAs[Long]("covered") == 2L)
    assert(math.abs(r.getAs[Double]("coverage") - 2.0 / 3.0) < 1e-12)
  }

  test("conformalSplit: k > n_cal -> null threshold, coverage 1") {
    // n_cal = 3, alpha = 0.1: k = ceil(4*0.9) = 4 > 3.
    val df = Seq((1L, true), (2L, true), (3L, true), (9L, false))
      .toDF("s", "cal")
    val r = Evaluate.conformalSplit(df, col("s"), col("cal"), 100000L)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("threshold")))
    assert(r.getAs[Long]("covered") == 1L)
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("conformalSplit: duplicate scores collapse onto one grid row") {
    // cal = [2,2,2,7], alpha=0.25: k = ceil(5*.75) = 4 -> threshold 7.
    val df = Seq((2L, true), (2L, true), (2L, true), (7L, true),
      (2L, false), (8L, false)).toDF("s", "cal")
    val r = Evaluate.conformalSplit(df, col("s"), col("cal"), 250000L)
      .collect().head
    assert(r.getAs[Long]("threshold") == 7L)
    assert(r.getAs[Long]("covered") == 1L)
  }

  // ---- woeIv ----------------------------------------------------------

  test("woeIv: hand smoothed case and zero-evidence category") {
    // cat A: 3 pos, 1 neg; cat B: 1 pos, 3 neg. G = B = 4, K = 2.
    // pp_A = 4/6, qq_A = 2/6 -> woe = ln(2); symmetric for B = -ln(2).
    val df = Seq(("A", true), ("A", true), ("A", true), ("A", false),
      ("B", true), ("B", false), ("B", false), ("B", false))
      .toDF("b", "p")
    val out = Evaluate.woeIv(df, col("b"), col("p"))
      .orderBy("bucket").collect()
    val ln2 = math.round(math.log(2.0) * 1e9)
    assert(out(0).getAs[Long]("woe_ppb") == ln2)
    assert(out(1).getAs[Long]("woe_ppb") == -ln2)
    // iv contribution (p-q)*ln(p/q) is positive on both sides
    assert(out.forall(_.getAs[Long]("iv_ppb") > 0L))
    // a category with only positives stays finite via smoothing
    val oneSided = Seq(("A", true), ("A", true), ("B", false))
      .toDF("b", "p")
    val o2 = Evaluate.woeIv(oneSided, col("b"), col("p")).collect()
    assert(o2.forall(r => !r.isNullAt(r.fieldIndex("woe_ppb"))))
  }

  // ---- paddingWaste ---------------------------------------------------

  test("paddingWaste: sorted order never wastes more than arrival") {
    // lengths interleaved so arrival batches pad badly: 100,1,100,1 ...
    val docs = (1 to 64).map(i =>
      (i.toLong, if (i % 2 == 0) 1L else 100L)).toDF("id", "n")
    val out = Pack.paddingWaste(docs, "id", "n", batchSize = 8)
      .orderBy("strategy").collect()
    val arrival = out(0); val sorted = out(1)
    assert(arrival.getAs[String]("strategy") == "arrival")
    assert(arrival.getAs[Long]("n_batches") == 8L)
    assert(arrival.getAs[Long]("real_tokens") ==
      sorted.getAs[Long]("real_tokens"))
    // arrival: every batch maxes at 100 -> padded = 64*100;
    // sorted: 4 batches of 100s (no waste), 4 of 1s (no waste).
    assert(arrival.getAs[Long]("padded_tokens") == 6400L)
    assert(sorted.getAs[Long]("padded_tokens") ==
      sorted.getAs[Long]("real_tokens"))
    assert(sorted.getAs[Long]("waste_ppm") == 0L)
    assert(arrival.getAs[Long]("waste_ppm") ==
      (6400L - 32L * 101L) * 1000000L / 6400L)
  }

  test("paddingWaste: ragged tail batch and layout invariance") {
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 7L), (4L, 2L), (5L, 9L))
      .toDF("id", "n")
    val a = Pack.paddingWaste(docs, "id", "n", 2)
      .orderBy("strategy").collect().toSeq
    assert(a.head.getAs[Long]("n_batches") == 3L) // 2+2+1
    val b = Pack.paddingWaste(docs.repartition(3), "id", "n", 2)
      .orderBy("strategy").collect().toSeq
    assert(a == b)
  }
}
