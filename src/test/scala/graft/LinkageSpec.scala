package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

/** Fellegi-Sunter record linkage: hand-computed u-probabilities and
  * log2 weights, null-field semantics, hot-block valve, pattern
  * packing. */
class LinkageSpec extends SparkSuite {
  import spark.implicits._

  private def fields2 = Seq(
    ("tag", col("f0"), col("f0")),
    ("grp", col("f1"), col("f1")))

  test("scorePairs: exact u collision mass, ln-ppb weights, patterns") {
    val left = Seq((1L, "x", "A"), (2L, "y", "B")).toDF("id", "f0", "f1")
      .withColumn("blk", lit(0))
    val right = Seq((3L, "x", "A"), (4L, "x", "C")).toDF("id", "f0", "f1")
      .withColumn("blk", lit(0))
    // u(f0): collisions x:1·2=2 over 2·2 pairs = 0.5
    // u(f1): collisions A:1·1=1 over 4 = 0.25; m = 0.9 both —
    // weights are Dedup.fsWeightsPpb ln-ppb longs, summed exactly
    val m = 0.9
    val (wA0, wD0) = graft.operators.Dedup.fsWeightsPpb(m, 0.5)
    val (wA1, wD1) = graft.operators.Dedup.fsWeightsPpb(m, 0.25)
    val got = Linkage.scorePairs(left, right, "id", "id",
        col("blk"), col("blk"), fields2, Seq(900000L, 900000L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 4)
    assert(got((1L, 3L)) == ((3L, 2L, wA0 + wA1))) // agree both
    assert(got((1L, 4L)) == ((1L, 1L, wA0 + wD1))) // f0 only
    assert(got((2L, 3L)) == ((0L, 0L, wD0 + wD1))) // neither
    assert(got((2L, 4L)) == ((0L, 0L, wD0 + wD1)))
  }

  test("scorePairs: null field never agrees, blocks partition candidates") {
    val left = Seq((1L, Some("x"), 0), (2L, None, 1)).toDF("id", "f0", "blk")
    val right = Seq((3L, Some("x"), 0), (4L, None, 1)).toDF("id", "f0", "blk")
    val fields = Seq(("tag", col("f0"), col("f0")))
    val got = Linkage.scorePairs(left, right, "id", "id",
        col("blk"), col("blk"), fields, Seq(900000L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // only same-block pairs exist; null = null does NOT agree
    assert(got == Map((1L, 3L) -> 1L, (2L, 4L) -> 0L))
  }

  test("patternCounts: rollup matches scorePairs, valve drops hot blocks") {
    val left = (1L to 30L).map(i => (i, s"v${i % 3}", i % 2))
      .toDF("id", "f0", "blk")
    val right = (31L to 60L).map(i => (i, s"v${i % 3}", i % 2))
      .toDF("id", "f0", "blk")
    val fields = Seq(("tag", col("f0"), col("f0")))
    val full = Linkage.patternCounts(left, right, col("blk"), col("blk"),
        fields)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byScore = Linkage.scorePairs(left, right, "id", "id",
        col("blk"), col("blk"), fields, Seq(500000L))
      .groupBy("pattern").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == byScore)
    assert(full.values.sum == 2L * 15L * 15L) // two blocks of 15×15
    // valve: both blocks have 15 rows per side -> maxBlock 10 drops all
    val valved = Linkage.patternCounts(left, right, col("blk"), col("blk"),
      fields, maxBlock = 10)
    assert(valved.count() == 0L)
  }

  test("emFit recovers planted m/u structure from pattern counts alone") {
    // plant a THREE-field population (the F-S identifiability minimum:
    // 2^3−1 = 7 free pattern dims ≥ 7 parameters): 500 matches with
    // m=(0.95, 0.9, 0.85), 9500 non-matches with u=(0.3, 0.05, 0.1);
    // expected pattern counts exact under conditional independence
    val m = Seq(0.95, 0.9, 0.85); val u = Seq(0.3, 0.05, 0.1)
    val nM = 500.0; val nU = 9500.0
    val rows = (0L to 7L).map { pat =>
      def pr(p: Seq[Double]) = (0 until 3).map(f =>
        if (((pat >> f) & 1L) == 1L) p(f) else 1 - p(f)).product
      (pat, math.round(nM * pr(m) + nU * pr(u)))
    }
    val fit = Linkage.emFit(rows.toDF("pattern", "n_pairs"), nFields = 3,
      iters = 300)
    // EM from the default init converges to the planted structure
    assert(math.abs(fit.p - 0.05) < 0.02, s"p=${fit.p}")
    (0 until 3).foreach { f =>
      assert(math.abs(fit.m(f) - m(f)) < 0.05, s"m=${fit.m}")
      assert(math.abs(fit.u(f) - u(f)) < 0.05, s"u=${fit.u}")
    }
    // deterministic: same input, same fit
    val fit2 = Linkage.emFit(rows.toDF("pattern", "n_pairs"), 3, 300)
    assert(fit2 == fit)
  }
}
