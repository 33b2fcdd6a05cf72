package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluate, GroupOps}

/** Target encoding (LOO + smoothed) and rank-biased overlap: hand
  * cases, identity properties, and layout invariance. */
class EncodeRboSpec extends SparkSuite {
  import spark.implicits._

  test("targetEncode hand case: LOO excludes the row, singleton -> null") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 100L) // singleton
    ).toDF("id", "cat", "y")
    val out = GroupOps.targetEncode(df, "id", col("cat"), col("y"), m = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // id 1: loo = (60-10)/2 = 25
    assert(out(1L).getLong(3) === 50L && out(1L).getLong(4) === 2L)
    assert(out(1L).getDouble(5) === 25.0)
    // smoothed id 1: ((60-10)*4 + 2*160) / ((2+2)*4) = 520/16 = 32.5
    assert(out(1L).getDecimal(6).longValueExact === 520L)
    assert(out(1L).getDecimal(7).longValueExact === 16L)
    assert(out(1L).getDouble(8) === 32.5)
    // singleton: loo null, smoothed = (0*4 + 2*160)/((0+2)*4) = 320/8 = 40
    assert(out(4L).isNullAt(5))
    assert(out(4L).getDouble(8) === 40.0)
  }

  test("targetEncode with m = 0 equals the pure LOO mean") {
    val df = (0 until 30).map(i => (i.toLong, "c" + (i % 3), (i * 7 % 11).toLong))
      .toDF("id", "cat", "y")
    val out = GroupOps.targetEncode(df, "id", col("cat"), col("y"), m = 0L)
      .collect()
    out.foreach { r =>
      if (!r.isNullAt(5)) {
        assert(math.abs(r.getDouble(8) - r.getDouble(5)) < 1e-12)
      }
    }
  }

  test("rbo: identical rankings -> rbo_num = full weight mass") {
    val r = (1 to 20).map(i => (i.toLong, i)).toDF("id", "rank")
    val out = Evaluate.rankBiasedOverlap(r, r, "id", "rank", depth = 20,
      p = 0.9).head
    // every id contributes W_m at its own rank: sum = sum over m of W_m
    val ws = Evaluate.rboSuffixWeightsPpt(20, 0.9)
    assert(out.getLong(2) === 20L)
    assert(out.getLong(3) === ws.sum)
    // truncated RBO of identical lists at D=20, p=0.9 is ~0.88 (not 1 -
    // the tail mass beyond D is unseen by construction)
    assert(out.getDouble(4) > 0.85 && out.getDouble(4) < 1.0)
  }

  test("rbo: disjoint rankings -> 0; hand two-element case") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((3L, 1), (4L, 2)).toDF("id", "rank")
    val r0 = Evaluate.rankBiasedOverlap(a, b, "id", "rank", 2, 0.9).head
    assert(r0.getLong(3) === 0L && r0.getDouble(4) === 0.0)
    // swap order: ids {1,2} in both, ranks (1,2) vs (2,1): both m = 2
    val b2 = Seq((1L, 2), (2L, 1)).toDF("id", "rank")
    val r1 = Evaluate.rankBiasedOverlap(a, b2, "id", "rank", 2, 0.9).head
    val ws = Evaluate.rboSuffixWeightsPpt(2, 0.9)
    assert(r1.getLong(3) === 2L * ws(1))
  }

  test("rbo suffix weights: monotone decreasing, W_1 = total mass") {
    val ws = Evaluate.rboSuffixWeightsPpt(50, 0.9)
    assert(ws.size === 50)
    ws.sliding(2).foreach { case Seq(x, y) => assert(x > y) }
    // W_1 = sum of all per-depth weights = (1-p) sum p^(d-1)/d -> bounded by 1
    assert(ws.head < 1000000000000L)
  }

  test("layout invariance: targetEncode 1 vs 6 partitions") {
    val df = (0 until 500).map(i =>
      (i.toLong, "c" + (i % 7), ((i * 13) % 97).toLong)).toDF("id", "cat", "y")
    def run(p: Int) = GroupOps.targetEncode(df.repartition(p), "id",
        col("cat"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(3),
        r.getDecimal(6).longValueExact)).sortBy(_._1).toSeq
    assert(run(1) === run(6))
  }
}
