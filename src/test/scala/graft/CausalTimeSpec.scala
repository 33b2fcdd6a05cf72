package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluate, Funnel}

/** r7 additions, fifth wave: Nelson–Aalen hazard, Granger lag-1
  * causality, caliper propensity matching, time-decay attribution —
  * hand cases, conventions, determinism. */
class CausalTimeSpec extends SparkSuite {
  import spark.implicits._

  // ---- nelsonAalen ----------------------------------------------------

  test("nelsonAalen: textbook censored hand case, all integers") {
    // t=1: 1 event of 4 at risk -> h = 1e9/4 = 250000000
    // t=2: 1 censor of 3 -> h = 0
    // t=3: 1 event of 2 -> h = 500000000; chaz = 750000000
    // t=4: 1 event of 1 -> h = 1e9; chaz = 1750000000
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("t", "e")
    val out = Evaluate.nelsonAalen(df, Seq.empty, col("t"), col("e"))
      .orderBy("t").collect()
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 3L, 2L, 1L))
    assert(out.map(_.getAs[Long]("h_ppb")).toSeq ==
      Seq(250000000L, 0L, 500000000L, 1000000000L))
    assert(out.last.getAs[Long]("chaz_ppb") == 1750000000L)
  }

  test("nelsonAalen: grouped, ties at one time share the at-risk count") {
    // group g: t=5 with 2 events + 1 censor of 3 at risk -> h = 2e9/3.
    val df = Seq(("g", 5L, 1L), ("g", 5L, 1L), ("g", 5L, 0L),
      ("h", 1L, 1L)).toDF("grp", "t", "e")
    val out = Evaluate.nelsonAalen(df, Seq("grp"), col("t"), col("e"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("h_ppb")))
      .toMap
    assert(out("g") == 2000000000L / 3L)
    assert(out("h") == 1000000000L)
  }

  // ---- rmst -----------------------------------------------------------

  test("rmst: textbook censored hand case, exact ppb area") {
    // events t=1 (S->3/4), censor t=2, event t=3 (S->3/8), event t=4
    // (S->0). Area to tau=10: 1*1 + .75*1 + .75*1 + .375*1 + 0*6
    // = 2.875 -> 2_875_000_000 ppb.
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("t", "e")
    val r = Evaluate.rmst(df, Seq.empty, col("t"), col("e"), tau = 10L)
      .collect().head
    assert(r.getAs[java.math.BigDecimal]("rmst_ppb").longValueExact ==
      2875000000L)
    assert(math.abs(r.getAs[Double]("rmst") - 2.875) < 1e-12)
  }

  test("rmst: tau clips both the tail and a late first event") {
    // single subject, event at t=5, tau=3: S=1 on [0,3) -> rmst 3.
    val df = Seq((5L, 1L)).toDF("t", "e")
    val r = Evaluate.rmst(df, Seq.empty, col("t"), col("e"), tau = 3L)
      .collect().head
    assert(math.abs(r.getAs[Double]("rmst") - 3.0) < 1e-12)
  }

  // ---- grangerLag1 ----------------------------------------------------

  test("granger: x perfectly predicts next y -> rss_u ~ 0, huge f") {
    // y_t = x_{t-1} exactly; y's own lag is uninformative noise.
    val xs = Seq(5L, 1L, 4L, 2L, 8L, 3L, 7L, 2L, 6L, 1L)
    val rows = xs.indices.map { i =>
      (i.toLong, xs(i), if (i == 0) 0L else xs(i - 1))
    }
    val r = Evaluate.grangerLag1(rows.toDF("b", "x", "y"),
      col("b"), col("x"), col("y")).collect().head
    assert(r.getAs[Long]("n_pairs") == 9L)
    assert(r.getAs[Double]("rss_u") < 1e-9)
    assert(r.getAs[Double]("rss_r") > 1.0)
  }

  test("granger: gaps in the bucket grid drop pairs") {
    val rows = Seq((1L, 1L, 2L), (2L, 3L, 4L), (5L, 1L, 1L), (6L, 2L, 2L))
    val r = Evaluate.grangerLag1(rows.toDF("b", "x", "y"),
      col("b"), col("x"), col("y")).collect().head
    // consecutive pairs: (1,2) and (5,6) only
    assert(r.getAs[Long]("n_pairs") == 2L)
    assert(r.isNullAt(r.fieldIndex("f"))) // n <= 3
  }

  test("granger: constant series -> null (degenerate variance)") {
    val rows = (0L to 9L).map(b => (b, 1L, 1L))
    val r = Evaluate.grangerLag1(rows.toDF("b", "x", "y"),
      col("b"), col("x"), col("y")).collect().head
    assert(r.isNullAt(r.fieldIndex("rss_r")))
    assert(r.isNullAt(r.fieldIndex("f")))
  }

  // ---- caliperMatchAtt ------------------------------------------------

  test("caliperMatch: nearest control, ties to backward, caliper cut") {
    // controls at s=100 (y=10) and s=200 (y=30); treated:
    //  s=140 -> backward (d=40 vs 60) -> ybar 10
    //  s=150 -> tie (50/50) -> backward -> 10
    //  s=190 -> forward (d=10) -> 30
    //  s=500 -> nearest d=300 > caliper 100 -> unmatched
    val df = Seq((100L, false, 10L), (200L, false, 30L),
      (140L, true, 50L), (150L, true, 50L), (190L, true, 50L),
      (500L, true, 99L)).toDF("s", "t", "y")
    val r = Evaluate.caliperMatchAtt(df, col("s"), col("t"), col("y"),
      caliper = 100L).collect().head
    assert(r.getAs[Long]("n_treated") == 4L)
    assert(r.getAs[Long]("n_matched") == 3L)
    assert(r.getAs[Long]("n_unmatched") == 1L)
    // att = ((50-10) + (50-10) + (50-30)) / 3
    assert(math.abs(r.getAs[Double]("att") - 100.0 / 3) < 1e-9)
  }

  test("caliperMatch: same-score controls match at distance 0 with " +
      "floor-div mean; no controls -> all unmatched") {
    val df = Seq((100L, false, 10L), (100L, false, 11L),
      (100L, true, 20L)).toDF("s", "t", "y")
    val r = Evaluate.caliperMatchAtt(df, col("s"), col("t"), col("y"),
      caliper = 0L).collect().head
    assert(r.getAs[Long]("n_matched") == 1L)
    // ybar_ppm = 21*1e6 div 2 = 10500000; att = (20e6 - 10500000)/1e6
    assert(math.abs(r.getAs[Double]("att") - 9.5) < 1e-9)
    val noC = Seq((100L, true, 20L)).toDF("s", "t", "y")
    val r2 = Evaluate.caliperMatchAtt(noC, col("s"), col("t"), col("y"),
      caliper = 100L).collect().head
    assert(r2.getAs[Long]("n_matched") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("att")))
  }

  test("caliperMatch: deterministic under repartition") {
    val df = spark.range(20000).select(
      pmod(xxhash64(col("id"), lit(1)), lit(1000L)).as("s"),
      (pmod(col("id"), lit(2)) === 0).as("t"),
      pmod(xxhash64(col("id"), lit(2)), lit(100L)).as("y"))
    val one = Evaluate.caliperMatchAtt(df, col("s"), col("t"),
      col("y"), 5L).collect().head
    val two = Evaluate.caliperMatchAtt(df.repartition(9), col("s"),
      col("t"), col("y"), 5L).collect().head
    assert(one.toSeq.init == two.toSeq.init)
    assert(one.getAs[Double]("att") == two.getAs[Double]("att"))
  }

  // ---- timeDecayAttribution -------------------------------------------

  test("timeDecay: weights halve per completed half-life, exact shares") {
    // conversion at t=100; touches: A at t=99 (0 half-lives -> 1e6),
    // B at t=89 (1 -> 500000), A at t=79 (2 -> 250000).
    // W = 1750000; credits: A = (1e6*1e6)div W + (250000*1e6)div W,
    // B = (500000*1e6) div W.
    val hl = 10L
    val ev = Seq((1L, 100L, "conv", 900L), (1L, 99L, "a", 1L),
      (1L, 89L, "b", 2L), (1L, 79L, "a", 3L)).toDF("u", "ts", "t", "id")
    val out = Funnel.timeDecayAttribution(ev, "u", "ts", "t", "id",
        "conv", Seq("a", "b"), windowNs = 1000L, halfLifeNs = hl)
      .collect().map(r => (r.getAs[String]("channel"),
        r.getAs[Long]("credit_ppm"))).toMap
    val w = 1750000L
    assert(out("a") ==
      1000000L * 1000000L / w + 250000L * 1000000L / w)
    assert(out("b") == 500000L * 1000000L / w)
  }

  test("timeDecay: ancient touches decay to zero weight") {
    // single touch 63 half-lives back: 1e6 div 2^62 = 0 -> W = 0,
    // the conversion attributes nothing.
    val ev = Seq((1L, 10000L, "conv", 900L), (1L, 10000L - 630L, "a", 1L))
      .toDF("u", "ts", "t", "id")
    val out = Funnel.timeDecayAttribution(ev, "u", "ts", "t", "id",
      "conv", Seq("a"), windowNs = 100000L, halfLifeNs = 10L).collect()
    assert(out.isEmpty)
  }
}
