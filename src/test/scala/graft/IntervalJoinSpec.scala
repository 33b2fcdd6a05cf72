package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Interval overlap / containment joins: brute-force parity on random
  * intervals, closed-endpoint semantics, negative-time floor bucketing,
  * key isolation, exactly-once pair attribution across bucket widths,
  * and the loud span-guard refusal. */
class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  // deterministic pseudo-random intervals (splitmix-ish mix, no RNG)
  private def ivs(n: Int, key: Int => Int, len: Int => Long): DataFrame =
    (0 until n).map { i =>
      val s = ((i * 2654435761L) % 1000L) - 200L // some negative starts
      (i.toLong, key(i), s, s + len(i))
    }.toDF("id", "k", "st", "en")

  private def brute(l: DataFrame, r: DataFrame): Set[(Long, Long)] =
    l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") &&
        col("l.st") <= col("r.en") && col("r.st") <= col("l.en"))
      .select(col("l.id"), col("r.id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq

  test("overlap == brute force, every pair exactly once, two widths") {
    val l = ivs(120, _ % 5, i => (i % 40).toLong)
    val r = ivs(90, _ % 5, i => ((i * 3) % 55).toLong)
    val want = brute(l, r)
    for (w <- Seq(7L, 100L)) {
      val got = pairs(IntervalJoin.overlap(l, r, Seq("k"),
        "id", "st", "en", "id", "st", "en", bucketWidth = w))
      assert(got.size === got.toSet.size, s"dup pairs at width $w")
      assert(got.toSet === want, s"mismatch at width $w")
    }
  }

  test("closed endpoints: touching intervals match; 1-off gap does not") {
    val l = Seq((1L, 0, 0L, 10L)).toDF("id", "k", "st", "en")
    val r = Seq((2L, 0, 10L, 20L), (3L, 0, 11L, 20L))
      .toDF("id", "k", "st", "en")
    val got = pairs(IntervalJoin.overlap(l, r, Seq("k"),
      "id", "st", "en", "id", "st", "en", bucketWidth = 4))
    assert(got === Seq((1L, 2L)))
  }

  test("keys isolate: identical times under different keys never pair") {
    val l = Seq((1L, 0, 0L, 100L), (2L, 1, 0L, 100L)).toDF("id", "k", "st", "en")
    val got = pairs(IntervalJoin.overlap(l, l, Seq("k"),
      "id", "st", "en", "id", "st", "en", bucketWidth = 10))
    assert(got.toSet === Set((1L, 1L), (2L, 2L)))
  }

  test("overlap bounds are the intersection") {
    val l = Seq((1L, 0, -15L, 40L)).toDF("id", "k", "st", "en")
    val r = Seq((2L, 0, 20L, 90L)).toDF("id", "k", "st", "en")
    val row = IntervalJoin.overlap(l, r, Seq("k"),
      "id", "st", "en", "id", "st", "en", bucketWidth = 8)
      .select("o_start", "o_end").collect()
    assert(row.map(x => (x.getLong(0), x.getLong(1))).toSeq === Seq((20L, 40L)))
  }

  test("inverted and null intervals drop instead of matching") {
    val l = Seq((1L, 0, 50L, 10L)).toDF("id", "k", "st", "en") // inverted
    val r = Seq((2L, 0, 0L, 100L)).toDF("id", "k", "st", "en")
    assert(IntervalJoin.overlap(l, r, Seq("k"),
      "id", "st", "en", "id", "st", "en", bucketWidth = 10).count() === 0L)
  }

  test("span guard refuses loudly instead of exploding") {
    val l = Seq((1L, 0, 0L, 1000000L)).toDF("id", "k", "st", "en")
    val e = intercept[Exception] {
      IntervalJoin.overlap(l, l, Seq("k"), "id", "st", "en",
        "id", "st", "en", bucketWidth = 10, maxSpanBuckets = 100).count()
    }
    assert(e.getMessage.contains("IntervalJoin") ||
      e.getCause.getMessage.contains("IntervalJoin"))
  }

  test("contains == brute force point-in-interval, exactly once") {
    val iv = ivs(80, _ % 3, i => (i % 30).toLong)
    val pts = (0 until 200)
      .map(i => (1000L + i, i % 3, ((i * 1103515245L) % 900L) - 100L))
      .toDF("id", "k", "t")
    val want = pts.as("p").join(iv.as("i"),
        col("p.k") === col("i.k") &&
        col("i.st") <= col("p.t") && col("p.t") <= col("i.en"))
      .select(col("p.id"), col("i.id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = IntervalJoin.contains(pts, iv, Seq("k"), "id", "t",
        "id", "st", "en", bucketWidth = 16)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got.size === got.toSet.size)
    assert(got.toSet === want)
  }
}
