package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

/** Multinomial Naive Bayes: hand-computed weight parity, separable-
  * corpus recovery, the OOV-as-unseen rule, prior-only classification
  * of token-less docs, and layout invariance. */
class NaiveBayesSpec extends SparkSuite {
  import spark.implicits._

  private def ppb(x: Double): Long = math.round(x * 1e9)

  test("fit weights match the hand-computed Laplace ratios") {
    val docs = Seq(
      (1L, "a", "cat cat dog"),
      (2L, "a", "cat fish"),
      (3L, "b", "dog dog bird")
    ).toDF("id", "label", "text")
    val m = LangModel.naiveBayesFit(docs, col("label"), col("text"))
    // vocab = {cat, dog, fish, bird} -> V = 4; n_a = 5 tokens, n_b = 3
    val ws = m.wordWeights.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ws(("a", "cat")) === ppb(math.log(4.0 / 9.0)))  // (3+1)/(5+4)
    assert(ws(("a", "dog")) === ppb(math.log(2.0 / 9.0)))
    assert(ws(("b", "dog")) === ppb(math.log(3.0 / 7.0)))  // (2+1)/(3+4)
    assert(ws(("b", "bird")) === ppb(math.log(2.0 / 7.0)))
    val cs = m.classStats.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(cs("a") === ((2L, 5L, ppb(math.log(2.0 / 3.0)), ppb(math.log(1.0 / 9.0)))))
    assert(cs("b") === ((1L, 3L, ppb(math.log(1.0 / 3.0)), ppb(math.log(1.0 / 7.0)))))
  }

  test("separable corpus: every doc classified back to its label") {
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "sport", "goal match team win play score")
      else (i.toLong, "tech", "code build spark query shuffle join")
    }.toDF("id", "label", "text")
    val m = LangModel.naiveBayesFit(docs, col("label"), col("text"))
    val preds = LangModel.naiveBayesScore(docs, m, "id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 40).foreach { i =>
      assert(preds(i.toLong) === (if (i % 2 == 0) "sport" else "tech"))
    }
  }

  test("OOV tokens take the unseen weight; token-less docs use priors") {
    val train = Seq(
      (1L, "a", "cat cat cat"),
      (2L, "a", "cat cat"),
      (3L, "b", "dog")
    ).toDF("id", "label", "text")
    val m = LangModel.naiveBayesFit(train, col("label"), col("text"))
    val probe = Seq((10L, "zebra zebra"), (11L, "")).toDF("id", "text")
    val out = LangModel.naiveBayesScore(probe, m, "id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // V = 2; zebra unseen everywhere: score_l = 2*unseen_l + prior_l
    val scoreA = 2L * ppb(math.log(1.0 / 7.0)) + ppb(math.log(2.0 / 3.0))
    val scoreB = 2L * ppb(math.log(1.0 / 3.0)) + ppb(math.log(1.0 / 3.0))
    val expect = if (scoreA >= scoreB) "a" else "b"
    assert(out(10L)._1 === expect)
    assert(out(10L)._2 === 2L)
    assert(out(10L)._3 === math.max(scoreA, scoreB))
    // empty text -> priors alone -> label "a" (2/3 of docs)
    assert(out(11L) === (("a", 0L, ppb(math.log(2.0 / 3.0)))))
  }

  test("layout invariance: 1 vs 7 partitions, identical predictions") {
    val docs = (0 until 60).map { i =>
      (i.toLong, if (i % 3 == 0) "x" else "y",
        s"tok${i % 5} tok${i % 7} shared word")
    }.toDF("id", "label", "text")
    def run(parts: Int) = {
      val d = docs.repartition(parts)
      val m = LangModel.naiveBayesFit(d, col("label"), col("text"))
      LangModel.naiveBayesScore(d, m, "id", col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1).toSeq
    }
    assert(run(1) === run(7))
  }
}
