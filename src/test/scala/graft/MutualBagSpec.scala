package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Knn}

/** Reciprocal-kNN pair filtering and bag-of-words (order-erased) dedup. */
class MutualBagSpec extends SparkSuite {
  import spark.implicits._

  test("mutualPairsFromHits: hubs die, mutual pairs survive with both ranks") {
    // a and b reciprocate; hub h is in everyone's list but reciprocates
    // nobody (its own list holds only x)
    val hits = Seq(
      (1L, 2L, 0.1, 1), (1L, 9L, 0.2, 2), // a: [b, hub]
      (2L, 1L, 0.1, 1), (2L, 9L, 0.3, 2), // b: [a, hub]
      (9L, 7L, 0.05, 1) // hub: [x]
    ).toDF("query_id", "id", "distance", "rank")
    val got = Knn.mutualPairsFromHits(hits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq((1L, 2L, 1, 1)))
  }

  test("mutualPairsFromHits: asymmetric ranks carried per direction") {
    val hits = Seq(
      (1L, 2L, 0.5, 3), // b is a's 3rd
      (2L, 1L, 0.5, 1) // a is b's 1st
    ).toDF("query_id", "id", "distance", "rank")
    val got = Knn.mutualPairsFromHits(hits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq((1L, 2L, 3, 1)))
  }

  test("bagDedup: permutations collapse, multiplicity changes do not") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma ALPHA, beta!"), // permuted + case/punct noise
      (3L, "alpha alpha beta gamma"), // extra repeat -> different bag
      (4L, "alpha beta delta")
    ).toDF("id", "text")
    val groups = Dedup.bagDedup(docs, "id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups === Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("jaccardPairsPrefix == full-index jaccardPairs at three thresholds") {
    import graft.operators.Dedup
    // pseudo-random corpus with planted near-dup pairs
    val docs = ((0L until 120L).map { i =>
      val ws = (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i, ws.mkString(" "))
    } ++ (0L until 10L).map { i => // planted: doc i with one word changed
      val ws = (0 until 12).map(j =>
        if (j == 0) "zzz" else s"w${(i * 7 + j * 3) % 40}")
      (1000L + i, ws.mkString(" "))
    }).toDF("id", "text")
    for (t <- Seq(0.2, 0.5, 0.8)) {
      val full = Dedup.jaccardPairs(docs, "id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
      val pref = Dedup.jaccardPairsPrefix(docs, "id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
      assert(pref === full, s"threshold $t")
    }
    // the planted pairs survive at a high threshold
    val high = Dedup.jaccardPairsPrefix(docs, "id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 10L).forall(i => high((i, 1000L + i))))
  }

  test("bagDedup: layout invariance of keep_id") {
    val docs = (0L until 100L).map(i => (i, s"w${i % 7} w${(i * 3) % 7}"))
      .toDF("id", "text")
    val a = Dedup.bagDedup(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.bagDedup(docs.repartition(7), "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
