package graft

import graft.operators.TextSearch

/** Positional phrase + proximity search: adjacency/order semantics,
  * overlapping occurrences, tokenizer normalization, window bounds. */
class PhraseSearchSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the quick brown dog"),
    (2L, "quick brown"),
    (3L, "brown quick"), // order matters
    (4L, "quick fast brown"), // adjacency matters
    (5L, "x x x x"), // overlapping occurrences
    (6L, "Quick, BROWN!") // tokenizer lowercases and strips punct
  ).toDF("id", "text")

  private def pos(phrase: String): Seq[(Long, Int)] =
    TextSearch.phrasePositions(docs, "id", "text", phrase)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq

  test("phrase matches adjacency and order, not bags") {
    assert(pos("quick brown") ===
      Seq((1L, 1), (1L, 7), (2L, 0), (6L, 0)))
  }

  test("overlapping occurrences all found") {
    assert(pos("x x") === Seq((5L, 0), (5L, 1), (5L, 2)))
    assert(pos("x x x") === Seq((5L, 0), (5L, 1)))
  }

  test("three-token phrase: every token must line up") {
    assert(pos("quick brown fox") === Seq((1L, 1)))
    assert(pos("quick brown cat") === Seq())
  }

  test("phraseCounts aggregates per doc, zero-match docs absent") {
    val got = TextSearch.phraseCounts(docs, "id", "text", "quick brown")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 6L -> 1L))
  }

  test("same-term proximity: real co-occurrences only, no self-match") {
    val got = TextSearch.proximityPairs(docs, "id", "text",
        "x", "x", window = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 5 "x x x x": all ordered position pairs within 2, both
    // directions, but never (p, p)
    assert(got.forall { case (_, a, b) => a != b })
    assert(got === Set((5L, 0, 1), (5L, 1, 0), (5L, 0, 2), (5L, 2, 0),
      (5L, 1, 2), (5L, 2, 1), (5L, 1, 3), (5L, 3, 1), (5L, 2, 3),
      (5L, 3, 2)))
  }

  test("proximity window is inclusive and symmetric") {
    // fox at 3, dog at 9: distance 6
    val got = TextSearch.proximityPairs(docs, "id", "text",
        "fox", "dog", window = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got === Seq((1L, 3, 9)))
    assert(TextSearch.proximityPairs(docs, "id", "text",
      "fox", "dog", window = 5).count() === 0L)
  }

  test("rakeKeywords: hand case — deg/freq ratios, phrase sums, merging") {
    // phrases: "red apple" ×2 (docs 1, 2), "green pear" ×1, "apple" ×1
    val d = Seq(
      (1L, "red apple the green pear"),
      (2L, "the red apple a apple")).toDF("id", "text")
    val got = TextSearch.rakeKeywords(d, "id", "text", Seq("a", "the"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // freq: red 2, apple 3, green 1, pear 1
    // deg:  red 2+2=4, apple 2+2+1=5, green 2, pear 2
    val red = 4L * 1000000 / 2; val apple = 5L * 1000000 / 3
    val green = 2L * 1000000 / 1; val pear = 2L * 1000000 / 1
    assert(got == Map(
      "red apple" -> (2L, red + apple),
      "green pear" -> (1L, green + pear),
      "apple" -> (1L, apple)))
  }

  test("rakeKeywords: layout invariance; leading/trailing delimiters") {
    val d = Seq((1L, "the apple red"), (2L, "apple red the"),
      (3L, "the the")).toDF("id", "text")
    val a = TextSearch.rakeKeywords(d, "id", "text", Seq("the"))
      .collect().map(_.toString).sorted.toSeq
    val b = TextSearch.rakeKeywords(d.repartition(5), "id", "text",
      Seq("the")).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // doc 3 is all stopwords -> contributes nothing; both phrase docs merge
    assert(a.length == 1 && a.head.contains("apple red"))
  }
}
