package graft

import org.apache.spark.sql.functions._

import graft.functions.{lcs_length, TextFunctions}
import graft.operators.Evaluate

/** LcsLength kernel + ROUGE-L: hand-derived LCS values, metric identities,
  * asymmetry, and degenerate inputs. */
class RougeSpec extends SparkSuite {
  import spark.implicits._

  private def lcsOf(a: Seq[String], b: Seq[String]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(lcs_length(col("a"), col("b"))).head.getInt(0)

  test("lcs_length hand checks") {
    assert(lcsOf(Seq("the", "cat", "sat", "on", "the", "mat"),
      Seq("the", "cat", "is", "on", "the", "mat")) === 5)
    assert(lcsOf(Seq("a", "b", "c"), Seq("a", "b", "c")) === 3)
    assert(lcsOf(Seq("a", "b"), Seq("x", "y")) === 0)
    assert(lcsOf(Seq("a", "b", "c", "d"), Seq("d", "c", "b", "a")) === 1)
    // non-contiguous subsequence (where BLEU-style n-grams see nothing)
    assert(lcsOf(Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c")) === 3)
    assert(lcsOf(Seq.empty, Seq("a")) === 0)
  }

  test("rougeL metrics: identity, asymmetry, zero") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"),      // identical -> f = 1
      (2L, "a x b y c", "a b c"),      // lcs 3: p = 3/5, r = 1
      (3L, "q w e", "r t z")           // disjoint -> 0
    ).toDF("id", "cand", "ref")
    val out = Evaluate.rougeL(pairs, "id",
        TextFunctions.tokens(col("cand")), TextFunctions.tokens(col("ref")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(out(1L) === ((4L, 1.0, 1.0, 1.0)))
    val (l2, p2, r2, f2) = out(2L)
    assert(l2 === 3L && p2 === 3.0 / 5.0 && r2 === 1.0)
    assert(f2 === 2.0 * p2 * r2 / (p2 + r2))
    assert(out(3L) === ((0L, 0.0, 0.0, 0.0)))
  }

  test("rougeL handles null and empty sides") {
    val pairs = Seq((1L, null.asInstanceOf[String], "a b"), (2L, "a b", ""))
      .toDF("id", "cand", "ref")
    val out = Evaluate.rougeL(pairs, "id",
        TextFunctions.tokens(col("cand")), TextFunctions.tokens(col("ref")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(6))).toMap
    assert(out(1L) === ((0L, 2L, 0L, 0.0)))
    assert(out(2L) === ((2L, 0L, 0L, 0.0)))
  }

  test("dtw_distance: hand cases, reference parity, null rules") {
    import spark.implicits._
    import graft.functions.dtw_distance
    def refDtw(a: Seq[Long], b: Seq[Long]): Long = {
      val inf = 1000000000000000L
      val dp = Array.fill(a.length + 1, b.length + 1)(inf)
      dp(0)(0) = 0L
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1)))
      dp(a.length)(b.length)
    }
    def run(a: Seq[Long], b: Seq[Long]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(dtw_distance(col("a"), col("b"))).head.getLong(0)
    assert(run(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 0L)
    assert(run(Seq(1L), Seq(5L)) == 4L)
    assert(run(Seq(0L, 0L), Seq(3L)) == 6L) // both map onto the single b
    // warping beats lockstep: a shifted spike aligns cheaply
    assert(run(Seq(0L, 5L, 0L, 0L), Seq(0L, 0L, 5L, 0L)) == 0L)
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 10) {
      val a = Seq.fill(rnd.nextInt(8) + 1)(rnd.nextInt(20).toLong)
      val b = Seq.fill(rnd.nextInt(8) + 1)(rnd.nextInt(20).toLong)
      assert(run(a, b) == refDtw(a, b))
    }
    // empty input -> null
    val e = Seq((Seq.empty[Long], Seq(1L))).toDF("a", "b")
      .select(dtw_distance(col("a"), col("b"))).head
    assert(e.isNullAt(0))
    // SQL registration parity
    graft.functions.registerAll(spark)
    assert(spark.sql("SELECT dtw_distance(array(1L,2L), array(2L,2L))")
      .head.getLong(0) == 1L)
  }
}
