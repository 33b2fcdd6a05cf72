package graft

import org.apache.spark.sql.functions._

import graft.operators.TextSearch

/** Prefix-completion index: hand counts, tie rule, length bounds,
  * topK cap, layout invariance. */
class CompletionsSpec extends SparkSuite {
  import spark.implicits._

  test("hand case: counts, ranks, tie rule, short-word bounds") {
    val docs = Seq(
      "spark spark spa sp",
      "spark spill spa",
      "query quick"
    ).toDF("text")
    val out = TextSearch.prefixCompletions(docs, col("text"),
        minLen = 2, maxLen = 3, topK = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    // prefix "sp": spark(3) > spa(2) > spill(1) > sp(1) -> top2
    assert(out(("sp", 1)) === (("spark", 3L)))
    assert(out(("sp", 2)) === (("spa", 2L)))
    // prefix "spa": spark(3) > spa(2)
    assert(out(("spa", 1)) === (("spark", 3L)))
    assert(out(("spa", 2)) === (("spa", 2L)))
    // "sp" itself (len 2) contributes only to the len-2 prefix
    assert(!out.contains(("spi", 3)))
    // tie rule: "query"(1) vs "quick"(1) at prefix "qu" -> word asc
    assert(out(("qu", 1)) === (("query", 1L)))
    assert(out(("qu", 2)) === (("quick", 1L)))
  }

  test("layout invariance: 1 vs 5 partitions") {
    val docs = (0 until 100).map(i => s"tok${i % 9} alpha${i % 4} beta")
      .toDF("text")
    def run(p: Int) = TextSearch.prefixCompletions(docs.repartition(p),
        col("text"), 1, 4, 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) === run(5))
  }
}
