package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Recommend
import graft.streaming.EventStream

/** r7 additions, ninth wave: next-item transition recommendations and
  * the streaming SPRT twin — sequence semantics, tie determinism,
  * batch-granular decisions, replay idempotence. */
class SeqRecSpec extends SparkSuite {
  import spark.implicits._

  // ---- nextItemRecs ---------------------------------------------------

  test("nextItem: transitions from consecutive pairs, last-item recs") {
    // u1: a->b->c; u2: a->b->a; u3: a->b. transitions:
    // a->b x3, b->c x1, b->a x1. minCount=1.
    // u1 last c: no successors -> no rows. u2 last a: rec b (cnt 3).
    // u3 last b: recs a and c (cnt 1 each, item-asc ties).
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "a", 1L), (2L, "b", 2L), (2L, "a", 3L),
      (3L, "a", 1L), (3L, "b", 2L)).toDF("u", "i", "o")
    val out = Recommend.nextItemRecs(ev, "u", "i", col("o"),
      topN = 5, minCount = 1L).collect()
    assert(!out.exists(_.getAs[Long]("user") == 1L))
    val u2 = out.filter(_.getAs[Long]("user") == 2L)
    assert(u2.map(r => (r.getAs[String]("item"), r.getAs[Long]("cnt")))
      .toSeq == Seq(("b", 3L)))
    val u3 = out.filter(_.getAs[Long]("user") == 3L)
      .sortBy(_.getAs[Int]("rn"))
    assert(u3.map(_.getAs[String]("item")).toSeq == Seq("a", "c"))
  }

  test("nextItem: self-transitions drop; minCount prunes; layout invariant") {
    val ev = Seq((1L, "a", 1L), (1L, "a", 2L), (1L, "b", 3L),
      (2L, "a", 1L), (2L, "b", 2L)).toDF("u", "i", "o")
    // a->a drops; a->b x2 survives minCount=2
    val out = Recommend.nextItemRecs(ev, "u", "i", col("o"),
      topN = 5, minCount = 2L).collect()
    // u1 last b, u2 last b: b has no successors -> no rows at all
    assert(out.isEmpty)
    val ev2 = ev.union(Seq((3L, "b", 1L), (3L, "c", 2L),
      (4L, "b", 1L), (4L, "c", 2L)).toDF("u", "i", "o"))
    val one = Recommend.nextItemRecs(ev2, "u", "i", col("o"),
      topN = 5, minCount = 2L).collect()
    val two = Recommend.nextItemRecs(ev2.repartition(7), "u", "i",
      col("o"), topN = 5, minCount = 2L).collect()
    assert(one.map(_.toSeq).toSet == two.map(_.toSeq).toSet)
    // u1/u2 last item b -> successor c (b->c x2)
    assert(one.count(r => r.getAs[String]("item") == "c") >= 2)
  }

  // ---- streaming SPRT -------------------------------------------------

  test("streamingSprt: batch-granular decision, replay-idempotent state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graftsprt").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Tuple1[Boolean]]
    val writer = EventStream.streamingSprtCounts(
        mem.toDF().toDF("x"), col("x"), path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    // batch 0: 10 successes -> under p0=0.2 vs p1=0.8 the LLR crosses
    // A = ln(19)e9 already; batch 1: 5 failures (would pull it back,
    // but the decision batch stays batch 0).
    mem.addData(Seq.fill(10)(Tuple1(true)): _*)
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData(Seq.fill(5)(Tuple1(false)): _*)
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    val d = EventStream.readSprtDecision(spark, s"$dir/state",
      200000L, 800000L, 50000L, 50000L).collect().head
    assert(d.getAs[Long]("n") == 15L && d.getAs[Long]("n_pos") == 10L)
    assert(d.getAs[Long]("n_batches") >= 2L)
    assert(d.getAs[String]("decision") == "accept_h1")
    val inc1 = math.round(1e9 * math.log(800000.0 / 200000))
    assert(d.getAs[Long]("llr_at_decision") == 10L * inc1)
    // replay: re-running the same writer over no new data must not
    // change the state (deltas are per-batch overwrites)
    val r3 = writer.start(); r3.processAllAvailable(); r3.stop()
    val d2 = EventStream.readSprtDecision(spark, s"$dir/state",
      200000L, 800000L, 50000L, 50000L).collect().head
    assert(d2.toSeq == d.toSeq)
  }
}
