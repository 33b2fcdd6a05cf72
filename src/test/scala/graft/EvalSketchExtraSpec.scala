package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluate, Graph, Quality, Sketch}

/** CM join-size estimation, walk-PMI, confusion/multi-class stats,
  * embedding drift, and the dataset fingerprint — hand cases and the
  * estimator/invariance contracts. */
class EvalSketchExtraSpec extends SparkSuite {
  import spark.implicits._

  test("cmJoinSize never underestimates and is exact sans collisions") {
    val a = (0 until 200).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i")).toDF("k")
    val b = (100 until 300).map(i => s"k$i").toDF("k")
    val truth = a.join(b, "k").count()
    // width 1024 over 300 keys: some birthday collisions remain —
    // never under, bounded over (E[extra] ~ sumA*sumB/width per row)
    val est1k = Sketch.cmJoinSize(
      Sketch.cmSketch(a, col("k"), 4, 1024),
      Sketch.cmSketch(b, col("k"), 4, 1024), 4)
      .head.getDecimal(0).longValueExact
    assert(est1k >= truth && est1k <= truth + 300, s"est $est1k vs $truth")
    // width 16 forces heavy collisions -> overestimate, never under
    val est = Sketch.cmJoinSize(
      Sketch.cmSketch(a, col("k"), 4, 16),
      Sketch.cmSketch(b, col("k"), 4, 16), 4)
      .head.getDecimal(0).longValueExact
    assert(est >= truth)
    // a handful of keys in 1024 buckets: collision-free -> exact
    val sa = Seq("x", "y", "z", "x").toDF("k")
    val sb = Seq("y", "z", "w").toDF("k")
    val tiny = Sketch.cmJoinSize(
      Sketch.cmSketch(sa, col("k"), 4, 1024),
      Sketch.cmSketch(sb, col("k"), 4, 1024), 4)
      .head.getDecimal(0).longValueExact
    assert(tiny === 2L)
  }

  test("cmJoinSize: disjoint key sets can report 0 via the row grid") {
    val a = Seq("a1").toDF("k"); val b = Seq("b1").toDF("k")
    val est = Sketch.cmJoinSize(
      Sketch.cmSketch(a, col("k"), 4, 1024),
      Sketch.cmSketch(b, col("k"), 4, 1024), 4)
      .head.getDecimal(0).longValueExact
    assert(est === 0L)
  }

  test("walkPairsPmi: counts/margins exact, pmi matches local math") {
    val walks = Seq(
      (1L, 0, 0, 10L), (1L, 0, 1, 20L), (1L, 0, 2, 10L),
      (1L, 1, 0, 10L), (1L, 1, 1, 20L),
      (2L, 0, 0, 20L), (2L, 0, 1, 30L)
    ).toDF("start", "walk", "step", "node")
    val out = Graph.walkPairsPmi(walks)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // pairs: 10->20 (x2), 20->10, 20->30 ; T = 4
    assert(out((10L, 20L))._1 === 2L)
    val (c, ma, mb, t, ppb) = out((10L, 20L))
    assert(ma === 2L && mb === 2L && t === 4L)
    assert(ppb === math.round(math.log(c.toDouble * t / (ma.toDouble * mb)) * 1e9))
  }

  test("confusionStats and multiClassStats hand cases") {
    val bin = Seq((0.9, true), (0.8, false), (0.3, true), (0.1, false))
      .toDF("sc", "pos")
    val r = Evaluate.confusionStats(bin, col("sc"), col("pos"), 0.5).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 1L, 1L, 1L)))
    assert(r.getDouble(4) === 0.5 && r.getDouble(5) === 0.5 &&
      r.getDouble(6) === 0.5)

    val mc = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("c", "b"))
      .toDF("t", "p")
    val out = Evaluate.multiClassStats(mc, col("t"), col("p"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") === ((2L, 1L, 1L))) // n_true, n_pred, tp
    assert(out("b") === ((1L, 3L, 1L)))
    assert(out("c") === ((1L, 0L, 0L))) // never predicted
  }

  test("embeddingDrift: exact ppm sums on a planted shift") {
    val a = (0 until 10).map(i => (i.toLong, Seq(0.5f, 0.25f))).toDF("id", "embedding")
    val b = (0 until 5).map(i => (i.toLong, Seq(0.5f, 0.75f))).toDF("id", "embedding")
    // columns: dim, n_a, sum_a_ppm, ss_a, n_b, sum_b_ppm, ss_b, mean_diff
    val out = Evaluate.embeddingDrift(a, b, "embedding")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(2), r.getLong(5), r.getDouble(7))))
      .toMap
    assert(out(0) === ((10L, 5L, 5000000L, 2500000L, 0.0)))
    assert(out(1)._3 === 2500000L && out(1)._4 === 3750000L)
    assert(math.abs(out(1)._5 - (-500000.0)) < 1e-6)
  }

  test("fingerprint: layout-invariant, any row change flips it") {
    val df = (0 until 300).map(i => s"row$i").toDF("k")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Quality.fingerprint(d, col("k")).head match {
        case r => (r.getLong(0), r.getLong(1), r.getLong(2))
      }
    assert(fp(df) === fp(df.repartition(7)))
    val changed = ((0 until 299).map(i => s"row$i") :+ "rowX").toDF("k")
    assert(fp(df) != fp(changed))
    // duplicated-pair blindness of XOR is covered by (sum, count)
    val dup = (df.collect().map(_.getString(0)) ++ Seq("row0", "row0")).toSeq.toDF("k")
    val (n1, x1, s1) = fp(df); val (n2, x2, s2) = fp(dup)
    assert(x1 === x2)
    assert(n1 != n2 && s1 != s2)
  }
}
