package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling: hashed-n-gram importance weights select
  * target-like documents. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private val raw = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "a cat and a cat chased the cat"),
    (2L, "stock market prices fell sharply today"),
    (3L, "market prices and stock futures fell"),
    (4L, "the dog sat on the cat")).toDF("id", "text")

  // target corpus: feline domain
  private val target = Seq(
    (100L, "the cat sat quietly"),
    (101L, "a cat chased another cat")).toDF("id", "text")

  test("bucketCounts: unigrams + bigrams, repeated features accumulate") {
    val c = Dsir.bucketCounts(
      Seq((7L, "x y x")).toDF("id", "text"), "id", col("text"), 1 << 20)
    // features: x, y, x, "x y", "y x" -> bucket of "x" carries cnt 2
    assert(c.agg(sum("cnt")).head.getLong(0) == 5L)
    assert(c.agg(max("cnt")).head.getLong(0) == 2L)
  }

  test("importanceWeights ranks target-domain docs above off-domain") {
    val w = Dsir.importanceWeights(raw, target, "id", col("text"),
        buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every raw doc gets a weight
    assert(w.size == 5)
    // cat-domain docs beat the finance docs
    val cats = Seq(0L, 1L, 4L).map(w)
    val finance = Seq(2L, 3L).map(w)
    assert(cats.min > finance.max,
      s"expected cat docs $cats above finance docs $finance")
  }

  test("resampleTop is deterministic and keeps the k best") {
    val w = Dsir.importanceWeights(raw, target, "id", col("text"), 4096)
    val top2 = Dsir.resampleTop(w, "id", 2).select("id")
      .collect().map(_.getLong(0)).toSet
    val best = w.orderBy(col("weight").desc, col("id")).limit(2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 == best && top2.subsetOf(Set(0L, 1L, 4L)))
  }

  test("weight is an exact decimal dot-product: partitioning-invariant") {
    val a = Dsir.importanceWeights(raw.repartition(1), target, "id",
      col("text"), 4096).orderBy("id").collect().toSeq
    val b = Dsir.importanceWeights(raw.repartition(7), target, "id",
      col("text"), 4096).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
