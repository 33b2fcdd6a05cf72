package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Evaluate, Quality}

/** l-diversity (entropy + recursive), SCD-2 history merge, the exact
  * best-split stump, and exact average precision — hand cases, edge
  * conventions, and layout invariance. */
class PrivacySplitSpec extends SparkSuite {
  import spark.implicits._

  // ---------------- l-diversity ----------------

  test("lDiversity hand case: entropy and recursive verdicts") {
    // cohort A: values [x,x,x,y] -> distinct 2, r1=3, tail_2=1
    //   H = -(3/4)ln(3/4) - (1/4)ln(1/4)
    // cohort B: uniform [a,b,c] -> H = ln(3), r1=1, tail_2=2
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "a"), ("B", "b"), ("B", "c")
    ).toDF("qi", "s")
    val out = Quality.lDiversity(df, Seq("qi"), col("s"), l = 2, c = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getLong(6), r.getBoolean(7)))).toMap
    def hTerm(c: Long, n: Long): Long =
      math.round(-(c.toDouble / n) * math.log(c.toDouble / n) * 1e9)
    val hA = hTerm(3, 4) + hTerm(1, 4)
    val hB = 3 * hTerm(1, 3)
    val ln2ppb = math.round(math.log(2.0) * 1e9)
    assert(out("A") === ((4L, 2L, 3L, 1L, false, hA, hA >= ln2ppb)))
    // r1=3 vs c*tail=2 -> recursive fails; entropy 0.562 < ln2 -> fails
    assert(out("A")._5 === false && out("A")._7 === false)
    assert(out("B") === ((3L, 3L, 1L, 2L, true, hB, true)))
  }

  test("lDiversity: nulls excluded, singleton cohort fails everything") {
    val df = Seq(("C", "only"), ("C", "only"), ("C", null)).toDF("qi", "s")
    val r = Quality.lDiversity(df, Seq("qi"), col("s"), l = 2).head
    assert(r.getLong(1) === 2L)       // n_g counts non-null only
    assert(r.getLong(2) === 1L)       // one distinct value
    assert(r.getLong(4) === 0L)       // empty tail
    assert(!r.getBoolean(5) && !r.getBoolean(7))
  }

  // ---------------- SCD-2 merge ----------------

  test("scdMerge: change, gap, reappearance, is_current") {
    val snaps = Seq(
      // id 1: a a b b -> two runs, second current
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "b"),
      // id 2: present 1-2, absent 3, reappears at 4 with same content
      (2L, 1L, "z"), (2L, 2L, "z"), (2L, 4L, "z"),
      // id 3: only early versions -> not current
      (3L, 1L, "q"), (3L, 2L, "q")
    ).toDF("id", "v", "content")
    val out = Dedup.scdMerge(snaps, "id", col("v"), col("content"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).sortBy(t => (t._1, t._3))
    assert(out === Seq(
      (1L, "a", 1L, 2L, false), (1L, "b", 3L, 4L, true),
      (2L, "z", 1L, 2L, false), (2L, "z", 4L, 4L, true),
      (3L, "q", 1L, 2L, false)))
  }

  test("scdMerge rejects duplicate (id, version) rows") {
    val bad = Seq((1L, 1L, "a"), (1L, 1L, "b")).toDF("id", "v", "content")
    val e = intercept[Exception] {
      Dedup.scdMerge(bad, "id", col("v"), col("content")).collect()
    }
    assert(e.getMessage.contains("duplicate"))
  }

  // ---------------- best split ----------------

  test("bestSplit recovers a planted step boundary exactly") {
    // y jumps from 0 to 100 at x = 5: the split at x=5 separates cleanly
    val df = (1 to 10).flatMap(x => (0 until 3).map(_ =>
      ("g", x.toLong, if (x <= 5) 0L else 100L))).toDF("g", "x", "y")
    val r = Evaluate.bestSplit(df, Seq("g"), col("x"), col("y")).head
    assert(r.getLong(1) === 5L)    // split_x
    assert(r.getLong(2) === 15L && r.getLong(3) === 15L) // n_l, n_r
    assert(r.getLong(4) === 0L && r.getLong(5) === 1500L) // sums
    // gain = 0 + 1500^2/15 = 150000
    assert(r.getDecimal(6).longValueExact === 150000L)
  }

  test("bestSplit tie rule and the one-distinct-x empty case") {
    // symmetric data: splits at x=1 and x=2 have equal gain -> smallest x
    val df = Seq(("g", 1L, 10L), ("g", 2L, 0L), ("g", 3L, 10L))
      .toDF("g", "x", "y")
    val r = Evaluate.bestSplit(df, Seq("g"), col("x"), col("y")).collect()
    assert(r.length === 1)
    // gains: x=1 -> 100 + 50 = 150; x=2 -> 50 + 100 = 150 -> tie -> x=1
    assert(r.head.getLong(1) === 1L)
    val single = Seq(("h", 4L, 1L), ("h", 4L, 2L)).toDF("g", "x", "y")
    assert(Evaluate.bestSplit(single, Seq("g"), col("x"), col("y")).count() === 0L)
  }

  test("bestSplit guard refuses an oversized target scale") {
    val df = Seq(("g", 1L, 4000000000L), ("g", 2L, 1L)).toDF("g", "x", "y")
    val e = intercept[Exception] {
      Evaluate.bestSplit(df, Seq("g"), col("x"), col("y")).collect()
    }
    assert(e.getMessage.contains("3e9"))
  }

  // ---------------- average precision ----------------

  test("averagePrecision matches the textbook hand case") {
    // ranked by score desc: P N P P -> AP = (1/3)(1/1 + 2/3 + 3/4)
    val df = Seq(
      (1L, 0.9, true), (2L, 0.8, false), (3L, 0.7, true), (4L, 0.6, true)
    ).toDF("id", "score", "pos")
    val r = Evaluate.averagePrecision(df, col("id"), col("score"), col("pos")).head
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L)
    val expectNum = 1000000000L + (2L * 1000000000L) / 3L + (3L * 1000000000L) / 4L
    assert(r.getLong(2) === expectNum)
    assert(math.abs(r.getDouble(3) - (1.0 + 2.0 / 3 + 3.0 / 4) / 3) < 1e-8)
  }

  test("averagePrecision: perfect ranking -> 1, no positives -> null ap") {
    val perfect = Seq((1L, 0.9, true), (2L, 0.8, true), (3L, 0.1, false))
      .toDF("id", "score", "pos")
    val r1 = Evaluate.averagePrecision(perfect, col("id"), col("score"), col("pos")).head
    assert(r1.getLong(2) === 2000000000L && r1.getDouble(3) === 1.0)
    val none = Seq((1L, 0.9, false)).toDF("id", "score", "pos")
    val r2 = Evaluate.averagePrecision(none, col("id"), col("score"), col("pos")).head
    assert(r2.getLong(1) === 0L && r2.isNullAt(3))
  }

  test("averagePrecision tie determinism: equal scores rank by id") {
    // two equal scores: positive id 1 before negative id 2
    val df = Seq((1L, 0.5, true), (2L, 0.5, false), (3L, 0.4, true))
      .toDF("id", "score", "pos")
    val r = Evaluate.averagePrecision(df, col("id"), col("score"), col("pos")).head
    val expectNum = 1000000000L + (2L * 1000000000L) / 3L
    assert(r.getLong(2) === expectNum)
  }

  test("layout invariance for the batch: 1 vs 6 partitions") {
    val df = (0 until 200).map(i =>
      ("g" + (i % 3), (i % 11).toLong, ((i * 7) % 13).toLong))
      .toDF("g", "x", "y")
    def run(p: Int) = Evaluate.bestSplit(df.repartition(p), Seq("g"),
        col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(6).longValueExact)).sortBy(_._1).toSeq
    assert(run(1) === run(6))
  }
}
