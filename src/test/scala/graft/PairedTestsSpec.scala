package graft

import org.apache.spark.sql.functions._

import graft.operators.Evaluate

/** r7 additions, fourth wave: the paired/blocked rank tests (Wilcoxon
  * signed-rank, Friedman) and Wald's sequential probability ratio test —
  * textbook hand cases, tie handling, drop conventions, determinism. */
class PairedTestsSpec extends SparkSuite {
  import spark.implicits._

  // ---- wilcoxonSignedRank ---------------------------------------------

  test("wilcoxon: tie-free hand case") {
    // d = +1, -2, +3 -> |d| ranks 1, 2, 3; W+ = 1 + 3 = 4, wp_x2 = 8.
    // sigma^2 = 3*4*7/24 = 3.5; z = (4 - 3)/sqrt(3.5).
    val df = Seq((10L, 11L), (10L, 8L), (10L, 13L)).toDF("b", "a")
    val r = Evaluate.wilcoxonSignedRank(df, col("b"), col("a"))
      .collect().head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("n_zero") == 0L)
    assert(r.getAs[Long]("wp_x2") == 8L)
    assert(r.getAs[java.math.BigDecimal]("tie_cube").longValueExact == 0L)
    assert(math.abs(r.getAs[Double]("z") - 1.0 / math.sqrt(3.5)) < 1e-12)
  }

  test("wilcoxon: zeros drop, ties average, exact doubled ranks") {
    // d = 0, 0, +2, -2, +2 -> zeros drop (n_zero = 2), |d| all tied at 2:
    // tie-average rank = 2 for each (r2 = 4), W+ = 2 + 2 = 4 -> wp_x2 = 8.
    // tie_cube = 3^3 - 3 = 24; sigma^2 = 3*4*7/24 - 24/48 = 3.0.
    val df = Seq((5L, 5L), (7L, 7L), (1L, 3L), (4L, 2L), (9L, 11L))
      .toDF("b", "a")
    val r = Evaluate.wilcoxonSignedRank(df, col("b"), col("a"))
      .collect().head
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("n_zero") == 2L)
    assert(r.getAs[Long]("wp_x2") == 8L)
    assert(r.getAs[java.math.BigDecimal]("tie_cube").longValueExact == 24L)
    assert(math.abs(r.getAs[Double]("z") - (8.0 / 2 - 3.0) / math.sqrt(3.0))
      < 1e-12)
  }

  test("wilcoxon: all zeros -> n = 0, null z; layout invariance") {
    val df = Seq((1L, 1L), (2L, 2L)).toDF("b", "a")
    val r = Evaluate.wilcoxonSignedRank(df, col("b"), col("a"))
      .collect().head
    assert(r.getAs[Long]("n") == 0L && r.getAs[Long]("n_zero") == 2L)
    assert(r.isNullAt(r.fieldIndex("z")))
    val big = spark.range(1000).select(col("id").as("b"),
      (col("id") + pmod(col("id"), lit(7)) - 3L).as("a"))
    val one = Evaluate.wilcoxonSignedRank(big, col("b"), col("a"))
      .collect().head
    val two = Evaluate.wilcoxonSignedRank(big.repartition(7),
      col("b"), col("a")).collect().head
    assert(one.getAs[Long]("wp_x2") == two.getAs[Long]("wp_x2"))
    assert(one.getAs[Double]("z") == two.getAs[Double]("z"))
  }

  // ---- friedman -------------------------------------------------------

  test("friedman: classic tie-free hand case") {
    // 3 blocks x 3 treatments, within-block ranks:
    //  b1: t1=1, t2=2, t3=3; b2: same; b3: same -> R = (3, 6, 9).
    // chi2 = 12/(3*3*4) * (9+36+81) - 3*3*4 = 42 - 36 = 6.
    val rows = for (b <- 1 to 3; t <- 1 to 3) yield (b, s"t$t", t * 10L)
    val r = Evaluate.friedman(rows.toDF("b", "t", "v"),
      col("b"), col("t"), col("v")).collect().head
    assert(r.getAs[Long]("n_blocks") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_dropped") == 0L)
    assert(math.abs(r.getAs[Double]("chi2") - 6.0) < 1e-12)
  }

  test("friedman: ties within a block use average ranks") {
    // 2 blocks, k = 3. b1: (5, 5, 9) -> doubled ranks (3, 3, 6);
    // b2: (1, 2, 3) -> (2, 4, 6). R2 = (5, 7, 12), rsq = 25+49+144 = 218.
    // a2 = 9+9+36 + 4+16+36 = 110. num = 218 - 4*3*16 = 26;
    // den = 110 - 2*3*16 = 14; chi2 = 2*26/14.
    val rows = Seq((1, "a", 5L), (1, "b", 5L), (1, "c", 9L),
      (2, "a", 1L), (2, "b", 2L), (2, "c", 3L))
    val r = Evaluate.friedman(rows.toDF("b", "t", "v"),
      col("b"), col("t"), col("v")).collect().head
    assert(r.getAs[java.math.BigDecimal]("rsq").longValueExact == 218L)
    assert(r.getAs[java.math.BigDecimal]("a2").longValueExact == 110L)
    assert(math.abs(r.getAs[Double]("chi2") - 2.0 * 26 / 14) < 1e-12)
  }

  test("friedman: incomplete blocks drop and are counted; dup raises") {
    val rows = Seq((1, "a", 5L), (1, "b", 6L), (2, "a", 1L))
    val r = Evaluate.friedman(rows.toDF("b", "t", "v"),
      col("b"), col("t"), col("v")).collect().head
    assert(r.getAs[Long]("n_blocks") == 1L && r.getAs[Long]("n_dropped") == 1L)
    val dup = Seq((1, "a", 5L), (1, "a", 6L), (1, "b", 1L))
    intercept[Exception] {
      Evaluate.friedman(dup.toDF("b", "t", "v"),
        col("b"), col("t"), col("v")).collect()
    }
  }

  test("friedman: fully tied blocks -> null chi2") {
    val rows = Seq((1, "a", 5L), (1, "b", 5L), (2, "a", 3L), (2, "b", 3L))
    val r = Evaluate.friedman(rows.toDF("b", "t", "v"),
      col("b"), col("t"), col("v")).collect().head
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  // ---- sprtBinary -----------------------------------------------------

  test("sprt: crosses the H1 boundary at the first sufficient prefix") {
    // p0 = 0.2, p1 = 0.8, alpha = beta = 0.05: inc1 = ln(4)e9,
    // inc0 = ln(0.25)e9, A = ln(19)e9. Three successes in a row:
    // llr = 3*ln(4)e9 = 4.159e9 > 2.944e9 -> accept_h1 at n = 3.
    val df = Seq((1L, true), (2L, true), (3L, true), (4L, false))
      .toDF("k", "x")
    val r = Evaluate.sprtBinary(df, col("x"), col("k"),
      200000L, 800000L, 50000L, 50000L).collect().head
    assert(r.getAs[String]("decision") == "accept_h1")
    assert(r.getAs[Long]("n_decision") == 3L)
    assert(r.getAs[Long]("llr_at_decision") ==
      3L * math.round(1e9 * math.log(800000.0 / 200000)))
  }

  test("sprt: no crossing -> continue with null decision point") {
    val df = Seq((1L, true), (2L, false)).toDF("k", "x")
    val r = Evaluate.sprtBinary(df, col("x"), col("k"),
      490000L, 510000L, 50000L, 50000L).collect().head
    assert(r.getAs[String]("decision") == "continue")
    assert(r.isNullAt(r.fieldIndex("n_decision")))
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("n_pos") == 1L)
  }

  test("sprt: null outcomes drop (no silent H0 bias) — r8") {
    // two null-outcome rows interleaved: result identical to the
    // clean stream (before r8 they counted as failures, biasing llr)
    val clean = Seq((1L, Some(true)), (3L, Some(true)), (5L, Some(true)))
    val dirty = clean ++ Seq((2L, None: Option[Boolean]), (4L, None))
    val a = Evaluate.sprtBinary(clean.toDF("k", "x"), col("x"), col("k"),
      200000L, 800000L, 50000L, 50000L).collect().head
    val b = Evaluate.sprtBinary(dirty.toDF("k", "x"), col("x"), col("k"),
      200000L, 800000L, 50000L, 50000L).collect().head
    assert(a.toSeq == b.toSeq)
    assert(b.getAs[Long]("n") == 3L) // the dropped rows are countable
  }

  test("sprt: deterministic under repartition (key order, not layout)") {
    val df = spark.range(2000).select(col("id").as("k"),
      (pmod(xxhash64(col("id")), lit(10L)) < 3L).as("x"))
    val one = Evaluate.sprtBinary(df, col("x"), col("k"),
      250000L, 350000L, 50000L, 50000L).collect().head
    val two = Evaluate.sprtBinary(df.repartition(13), col("x"), col("k"),
      250000L, 350000L, 50000L, 50000L).collect().head
    assert(one.toSeq == two.toSeq)
  }
}
