package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Funnel, Knn}

/** r7 additions, second wave: frequent contiguous session paths and
  * sign-bit binary-quantized knn — hand cases, the funnel equivalence
  * contract, layout invariance. */
class PathsBinquantSpec extends SparkSuite {
  import spark.implicits._

  test("frequentPaths: trigrams stay inside sessions, support counts a session once") {
    val g = 100L
    val ev = Seq(
      // user 1 session 1: a b c a b c  -> a>b>c twice (occ), once (support)
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
      (1L, 30L, "a"), (1L, 40L, "b"), (1L, 50L, "c"),
      // user 1 session 2 (gap 101): a b c once more, new session
      (1L, 151L, "a"), (1L, 161L, "b"), (1L, 171L, "c"),
      // user 2: d spans a session break -> NO d-crossing trigram
      (2L, 0L, "a"), (2L, 10L, "b"), (2L, 20L, "d"),
      (2L, 200L, "a"), (2L, 210L, "b"), (2L, 220L, "c"))
      .toDF("u", "ts", "t")
    val out = Funnel.frequentPaths(ev, "u", "ts", "t", g, n = 3, topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // a>b>c: u1s1 twice + u1s2 once + u2s2 once = 4 occ, 3 sessions
    assert(out("a>b>c") == (4L, 3L))
    assert(out("b>c>a") == (1L, 1L)) // only inside u1s1
    assert(out("a>b>d") == (1L, 1L)) // u2s1 ends at d
    // nothing crosses the u2 session break (d ... a)
    assert(!out.contains("b>d>a") && !out.contains("d>a>b"))
    // layout invariance
    val out7 = Funnel.frequentPaths(ev.repartition(7), "u", "ts", "t",
        g, n = 3, topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out7 == out)
  }

  test("frequentPaths: topK cuts on the (support, occurrences, path) total order") {
    val ev = Seq(
      (1L, 0L, "x"), (1L, 1L, "y"),          // x>y support 1
      (2L, 0L, "a"), (2L, 1L, "b"),          // a>b support 2
      (3L, 0L, "a"), (3L, 1L, "b")).toDF("u", "ts", "t")
    val top1 = Funnel.frequentPaths(ev, "u", "ts", "t", 100L, 2, 1)
      .collect()
    assert(top1.length == 1 && top1(0).getString(0) == "a>b")
    assert(top1(0).getLong(2) == 2L)
  }

  test("signWords: strict-positive bits in 32-bit lanes, mismatched dims null") {
    // 64-d: dims 0, 31, 32, 63 positive; dim 1 exactly 0 (no bit)
    val v = Seq.tabulate(64)(i =>
      if (i == 0 || i == 31 || i == 32 || i == 63) 1.0f
      else if (i == 1) 0.0f else -0.5f)
    val df = Seq((1L, v), (2L, v.take(10)),
        (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "embedding")
    val rows = Ann.signWords(df, "id", "embedding", dim = 64)
      .orderBy("id").collect()
    assert(rows.length == 2) // null vector drops
    val w = rows(0).getSeq[Long](1)
    assert(w == Seq(1L | (1L << 31), 1L | (1L << 31)))
    // 32-bit lanes: every word below 2^32, never negative
    assert(w.forall(x => x >= 0L && x < (1L << 32)))
    assert(rows(1).isNullAt(1)) // 10-d row against dim=64 -> null
  }

  test("centered packing: integer mean thresholds, degeneracy on positive corpora fixed") {
    // hand case: means (2.0, 3.0) -> threshQ (4e6, 6e6), n = 2
    val docs = Seq((1L, Seq(1.0f, 5.0f)), (2L, Seq(3.0f, 1.0f)))
      .toDF("id", "embedding")
    val (n, thr) = Ann.signThresholdsQ(docs, "embedding", 2)
    assert(n == 2L && thr.toSeq == Seq(4000000L, 6000000L))
    val words = Ann.signWords(docs, "id", "embedding", dim = 2,
        threshQ = thr.toSeq, n = n)
      .orderBy("id").collect().map(_.getSeq[Long](1).head)
    assert(words.toSeq == Seq(2L, 1L)) // doc1: only dim1 above mean; doc2: only dim0
    // an all-positive corpus degenerates raw (one distinct signature)
    // and separates centered
    val rnd = new scala.util.Random(7)
    val pos = (0L until 50L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() + 0.1f))).toDF("id", "embedding")
    val rawDistinct = Ann.signWords(pos, "id", "embedding", dim = 8)
      .select("bq").distinct().count()
    assert(rawDistinct == 1L)
    val (pn, pthr) = Ann.signThresholdsQ(pos, "embedding", 8)
    val cDistinct = Ann.signWords(pos, "id", "embedding", dim = 8,
      threshQ = pthr.toSeq, n = pn).select("bq").distinct().count()
    assert(cDistinct > 1L)
  }

  test("binarySearchRerank with rerank >= corpus equals exact bruteForce") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 70L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("id", "embedding")
    val queries = (0L until 5L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("id", "embedding")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = key(Knn.bruteForce(docs, queries, 5, "cosine"))
    val funnel = key(Ann.binarySearchRerank(docs, queries, 5, "cosine",
      rerank = 70))
    assert(funnel == exact)
    // a narrow funnel still returns k ranked rows per query
    val narrow = Ann.binarySearchRerank(docs, queries, 5, "cosine",
      rerank = 10)
    assert(narrow.groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ == 5L))
  }

  test("truncatedRecall: hand case — 1-d tie flips the hit, full width is identity") {
    // ground truth (k=1) for q=(1,1) is doc 2 = (1,1); truncated to the
    // first dim both docs collapse to (1) — distance tie, id 1 wins —
    // so dim-1 recall is 0 and the zero-hit row must still report
    val docs = Seq((1L, Seq(1.0f, -1.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("id", "embedding")
    val queries = Seq((100L, Seq(1.0f, 1.0f))).toDF("id", "embedding")
    val out = Ann.truncatedRecall(docs, queries, k = 1, dims = Seq(1, 2))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1) == (0L, 1L, 0L))
    assert(out(2) == (1L, 1L, 1000000L))
  }

  test("compressionSignals: repetition compresses, bounds and nulls hold") {
    val rnd = new scala.util.Random(3)
    val repetitive = "lorem ipsum " * 200
    val noisy = Seq.fill(2400)(('a' + rnd.nextInt(26)).toChar +
      rnd.nextInt(10).toString).mkString
    val df = Seq((1L, repetitive), (2L, noisy), (3L, null), (4L, ""))
      .toDF("id", "text")
    val rows = graft.operators.Quality.compressionSignals(df, col("text"))
      .orderBy("id").collect()
    val rep = rows(0); val noi = rows(1)
    assert(rep.getLong(2) == rep.getString(1).getBytes("UTF-8").length)
    // repetition deflates to a small fraction; noise stays near raw
    assert(rep.getLong(4) < 100000L,  s"repetitive ratio ${rep.getLong(4)}")
    assert(noi.getLong(4) > 400000L, s"noisy ratio ${noi.getLong(4)}")
    assert(rep.getLong(3) > 0L && noi.getLong(3) <= noi.getLong(2) + 64L)
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(3) && rows(2).isNullAt(4))
    assert(rows(3).getLong(2) == 0L && rows(3).isNullAt(3)
      && rows(3).isNullAt(4))
    // deterministic: the codec is a pure function of the bytes
    val again = graft.operators.Quality.compressionSignals(df, col("text"))
      .orderBy("id").collect()
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq)
  }

  test("positionAttribution: U-shape credits, degenerate 1/2-touch rules, window bounds") {
    val ev = Seq(
      // user 1: 4 touches -> 400k first / 100k+100k middles / 400k last
      (1L, 10L, "view", 101L), (1L, 20L, "click", 102L),
      (1L, 30L, "view", 103L), (1L, 40L, "click", 104L),
      (1L, 100L, "purchase", 105L),
      // user 2: single touch -> 100%
      (2L, 5L, "view", 201L), (2L, 50L, "purchase", 202L),
      // user 3: two touches -> 50/50
      (3L, 5L, "click", 301L), (3L, 6L, "view", 302L),
      (3L, 50L, "purchase", 303L),
      // user 4: touch outside the window and one after conversion
      (4L, 1L, "view", 401L), (4L, 5000L, "purchase", 402L),
      (4L, 6000L, "click", 403L))
      .toDF("u", "ts", "t", "eid")
    val out = Funnel.positionAttribution(ev, "u", "ts", "t", "eid",
        "purchase", Seq("view", "click"), windowNs = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("view") == (4L, 3L, 2000000L))
    assert(out("click") == (3L, 2L, 1000000L))
    // untouched conversion (user 4) appears in no channel
    assert(out.values.map(_._2).sum == 5L)
  }

  test("sign_pack_words / hamming_words are SQL-callable") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT hamming_words(sign_pack_words(array(1.0D, -1.0D)),
        |                     sign_pack_words(array(-1.0D, 1.0D))) AS h
        |""".stripMargin).head.getLong(0)
    assert(r == 2L)
  }
}
