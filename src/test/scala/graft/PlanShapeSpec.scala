package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluate, Funnel, TextSearch}

/** Plan-shape locks for the r7 operators (the BloomSpec idiom): the
  * scale properties live in the PHYSICAL PLAN, so they are asserted,
  * not hoped for. */
class PlanShapeSpec extends SparkSuite {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("sessionize shuffles ONCE (user key serves both windows + agg)") {
    val ev = Seq((1L, 0L, "a"), (1L, 5L, "b")).toDF("u", "ts", "t")
    val p = plan(Funnel.sessionize(ev, "u", "ts", "t", 10L))
    assert(p.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("Broadcast")) == 1, p)
  }

  test("spellCorrect never forms the token x vocab product") {
    val vocab = Seq(("word", 1L)).toDF("word", "freq")
    val toks = Seq("wordy").toDF("tok")
    val p = plan(TextSearch.spellCorrect(toks, "tok", vocab, "word", "freq"))
    assert(!p.contains("CartesianProduct"), p)
    // and the top-1-per-token filter pushes into WindowGroupLimit
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("delete1Pairs: bucket self-join, never the n^2 product") {
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "s")
    val p = plan(graft.operators.Dedup.delete1Pairs(df, "id", "s"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p) // the delete-key buckets
  }

  test("isotonicFit collapses the corpus before any grid join") {
    val df = Seq((0.1, true), (0.2, false)).toDF("s", "y")
    val p = plan(Evaluate.isotonicFit(df, col("s"), col("y"), 10L))
    // the data-sized stage is ONE HashAggregate pair feeding the grid;
    // every join below it is grid-sized (no join touches the raw scan
    // side twice). Proxy assertion: exactly one partial aggregate over
    // the input relation's quantized bucket key.
    assert(p.split("\n").count(_.contains("HashAggregate(keys=[_b")) >= 1)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("binarySearchRerank: codegen hamming scan, broadcast funnel, no shuffle join") {
    val docs = Seq((1L, Seq(1.0f, -1.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("id", "embedding")
    val qs = Seq((9L, Seq(1.0f, 0.5f))).toDF("id", "embedding")
    val df = graft.operators.Ann.binarySearchRerank(docs, qs, 1, rerank = 2)
    val p = plan(df)
    // the scan side joins the broadcast query table — a shuffle join
    // here would re-key the whole corpus per query batch
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the scan kernel is the native codegen expression, no fallback
    // (sign_pack_words itself constant-folds into the LocalTableScan
    // on literal inputs — asserted via hamming's operands instead)
    assert(p.contains("hamming_words"), p)
    assert(!p.contains("CodegenFallback"), p)
  }
}
