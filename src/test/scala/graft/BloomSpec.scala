package graft

import org.apache.spark.sql.functions._

import graft.functions.Fnv64
import graft.operators.Sketch

/** Bloom filter: bit positions vs a local replay of the splitmix chain,
  * the packed word bitmap bit-for-bit, the no-false-negative guarantee,
  * a sane false-positive rate, OR-merge losslessness, and the prefilter
  * superset/completeness contract. */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private def keyHashLocal(s: String, seed: Long = 0L): Long =
    Fnv64.mix(Fnv64.hashString(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)) + seed)

  private def positionsLocal(h: Long, nHashes: Int, mBits: Int): Seq[Int] = {
    val mask = (1L << mBits) - 1L
    (0 until nHashes).map(i => (Fnv64.mix(h + i) & mask).toInt)
  }

  test("bloomBuild positions match a local replay of the hash chain") {
    val keys = (0 until 300).map(i => s"key$i")
    val df = keys.toDF("w")
    val got = Sketch.bloomBuild(df, Sketch.keyHash(col("w")),
      nHashes = 3, mBits = 10).collect().map(_.getInt(0)).toSet
    val want = keys.flatMap(k =>
      positionsLocal(keyHashLocal(k), 3, 10)).toSet
    assert(got === want)
  }

  test("bloomPack words equal the local bitmap bit-for-bit") {
    val keys = (0 until 120).map(i => s"k$i")
    val mBits = 9 // 512 bits = 8 words
    val pos = Sketch.bloomBuild(keys.toDF("w"), Sketch.keyHash(col("w")),
      nHashes = 4, mBits = mBits)
    val words = Sketch.bloomPack(pos, mBits).head.getSeq[Long](0)
    assert(words.size === (1 << (mBits - 6)))
    val local = new Array[Long](1 << (mBits - 6))
    keys.flatMap(k => positionsLocal(keyHashLocal(k), 4, mBits))
      .foreach(p => local(p >> 6) |= (1L << (p & 63)))
    assert(words === local.toSeq)
  }

  test("no false negatives; false-positive rate is in the expected band") {
    val members = (0 until 400).map(i => s"member$i")
    val nHashes = 5
    val mBits = 12 // m=4096, n=400, k=5 -> fp ~ (1-e^-0.488)^5 ~ 0.8%
    val packed = Sketch.bloomPack(
      Sketch.bloomBuild(members.toDF("w"), Sketch.keyHash(col("w")),
        nHashes, mBits), mBits)
    val probes = members ++ (0 until 2000).map(i => s"absent$i")
    val verdicts = probes.toDF("w").crossJoin(broadcast(packed))
      .select(col("w"), Sketch.bloomMightContain(Sketch.keyHash(col("w")),
        col("words"), nHashes, mBits).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    members.foreach(m => assert(verdicts(m), s"false negative on $m"))
    val fps = (0 until 2000).count(i => verdicts(s"absent$i"))
    assert(fps < 80, s"fp count $fps out of band") // ~16 expected, 5x slack
  }

  test("bloomMerge == building over the union") {
    val a = (0 until 100).map(i => s"a$i")
    val b = (0 until 100).map(i => s"b$i")
    val mBits = 8
    def pack(keys: Seq[String]) = Sketch.bloomPack(
      Sketch.bloomBuild(keys.toDF("w"), Sketch.keyHash(col("w")), 3, mBits),
      mBits)
    val merged = Sketch.bloomMerge(pack(a).unionByName(pack(b)))
      .head.getSeq[Long](0)
    val whole = pack(a ++ b).head.getSeq[Long](0)
    assert(merged === whole)
  }

  test("bloomPrefilter big-side plan is a pure filter — no join") {
    // the regression guard for the measured 959s trap: testing against
    // a words COLUMN via crossJoin materializes the bitmap into every
    // output row; the literal path must keep the big side join-free
    val small = (0 until 50).map(i => s"m$i").toDF("k")
    val big = (0 until 500).map(i => s"b$i").toDF("k")
    val plan = Sketch.bloomPrefilter(big, Sketch.keyHash(col("k")),
        small, Sketch.keyHash(col("k")), nHashes = 3, mBits = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("bloomPrefilter keeps every true match and only bounded extras") {
    val small = (0 until 50).map(i => i * 7L).toDF("id")
    val big = (0L until 2000L).toDF("id")
    val kept = Sketch.bloomPrefilter(big, Sketch.keyHash(col("id").cast("string")),
        small, Sketch.keyHash(col("id").cast("string")),
        nHashes = 4, mBits = 11)
      .collect().map(_.getLong(0)).toSet
    val trueKeys = (0 until 50).map(i => i * 7L).toSet
    assert(trueKeys.subsetOf(kept)) // completeness: no false negatives
    assert(kept.size < trueKeys.size + 200, s"kept ${kept.size}")
  }
}
