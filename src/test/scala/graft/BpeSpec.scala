package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE tokenizer: distributed word-count training pass + greedy merge
  * encode expression. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("trainLocal follows the classic merge order deterministically") {
    // the textbook corpus: {low:5, lower:2, newest:6, widest:3}
    val wc = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainLocal(wc, 4)
    // 'es' (6+3=9) wins round 1 (ties: 'es' vs 'st' both 9 → lexicographic)
    assert(merges.head == (("e", "s")))
    assert(merges(1) == (("es", "t")))
    // deterministic on re-run and on permuted input
    assert(Bpe.trainLocal(wc.reverse, 4) == merges)
  }

  test("encode applies lowest-rank merge first") {
    val df = Seq("abc").toDF("t")
    // bc outranks ab → 'a','bc', never 'ab','c'
    val got = df.select(Bpe.encode(col("t"), Seq(("b", "c"), ("a", "b"))))
      .as[Seq[String]].head
    assert(got == Seq("a", "bc"))
    val chained = df.select(Bpe.encode(col("t"), Seq(("a", "b"), ("ab", "c"))))
      .as[Seq[String]].head
    assert(chained == Seq("abc"))
  }

  test("encode round-trips: concatenated tokens reproduce the text") {
    val texts = Seq("hello world", "it's 42 degrees!", "  spaced  out  ",
      "MixedCase and 'contractions'")
    val merges = Bpe.train(texts.toDF("t"), col("t"), numMerges = 30)
    val got = texts.toDF("t")
      .select(col("t"), array_join(Bpe.encode(col("t"), merges), "").as("rt"))
      .as[(String, String)].collect()
    got.foreach { case (orig, rt) => assert(rt == orig) }
  }

  test("astral characters stay whole code points through train + encode") {
    // 😀 = U+1F600 (surrogate pair): per-char seeding would split it into
    // lone surrogates that mangle to '?' on UTF-8 encode
    val texts = Seq("😀😀 ok", "x 😀😀")
    val merges = Bpe.train(texts.toDF("t"), col("t"), numMerges = 5)
    assert(merges.contains(("😀", "😀")))
    def wellFormed(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        if (Character.isHighSurrogate(s(i))) {
          if (i + 1 >= s.length || !Character.isLowSurrogate(s(i + 1))) return false
          i += 2
        } else if (Character.isLowSurrogate(s(i))) return false
        else i += 1
      }
      true
    }
    assert(merges.forall { case (a, b) => wellFormed(a) && wellFormed(b) })
    val rt = texts.toDF("t")
      .select(col("t"), array_join(Bpe.encode(col("t"), merges), "").as("rt"))
      .as[(String, String)].collect()
    rt.foreach { case (orig, back) => assert(back == orig) }
    // the merged emoji pair is a single 2-code-point token, not 4 units
    val toks = Seq("😀😀").toDF("t")
      .select(Bpe.encode(col("t"), merges)).as[Seq[String]].head
    assert(toks == Seq("😀😀"))
  }

  test("space-run merges disambiguate (tuple-keyed ranks)") {
    // symbols that CONTAIN the old joined-key separator: with string
    // keys, pair ("  ","  ") and (" ","   ") collide; tuple keys don't
    val df = Seq("    ").toDF("t") // 4 spaces
    val got = df.select(Bpe.encode(col("t"),
      Seq((" ", " "), ("  ", "  ")))).as[Seq[String]].head
    assert(got == Seq("    "))
  }

  test("training compresses the corpus it was trained on") {
    val docs = (0 until 200).map(i =>
      s"the quick brown fox ${i % 7} jumps over the lazy dog").toDF("t")
    val merges = Bpe.train(docs, col("t"), numMerges = 50)
    // training stops early once no pair repeats (corpus saturated)
    assert(merges.size > 10 && merges.size <= 50)
    val stats = docs.select(
      sum(size(Bpe.encode(col("t"), merges))).as("bpe"),
      sum(length(col("t"))).as("chars")).head
    // 50 merges on a tiny repetitive corpus must compress well below chars
    assert(stats.getLong(0) < stats.getLong(1) / 2)
  }

  test("training is partitioning-invariant (corpus pass is an agg)") {
    val docs = (0 until 100).map(i => s"alpha beta gamma $i").toDF("t")
    val a = Bpe.train(docs.repartition(1), col("t"), 20)
    val b = Bpe.train(docs.repartition(13), col("t"), 20)
    assert(a == b)
  }

  test("encodeIds maps into the merge vocabulary; unseen chars are -1") {
    val docs = Seq("aaab aaab").toDF("t")
    val merges = Bpe.train(docs, col("t"), 5)
    // base chars that never participate in a merge (the space) must be
    // supplied to the vocab explicitly
    val vocab = Bpe.vocab(merges, baseChars = Seq(" ", "a", "b"))
    val ids = docs.select(Bpe.encodeIds(col("t"), merges, vocab))
      .as[Seq[Int]].head
    assert(ids.forall(_ >= 0))
    val unseen = Seq("zzz").toDF("t")
      .select(Bpe.encodeIds(col("t"), merges, vocab)).as[Seq[Int]].head
    assert(unseen.forall(_ == -1))
  }

  test("maxWords guard trips on oversized fit input") {
    val docs = (0 until 500).map(i => s"w$i").toDF("t")
    intercept[IllegalArgumentException] {
      Bpe.train(docs, col("t"), 10, maxWords = 100)
    }
  }

  test("wordpiece: canonical BERT example, whole-word UNK, longest match, position rule") {
    def enc(vocab: Seq[String], words: Seq[String],
        maxWordLen: Int = 100): Seq[String] =
      Seq(Tuple1(words)).toDF("w")
        .select(graft.functions.wordpiece_encode(col("w"), vocab,
          maxWordLen = maxWordLen))
        .head.getSeq[String](0)
    // the BERT paper's example
    val v = Seq("un", "##aff", "##able", "aff", "able", "a", "##a")
    assert(enc(v, Seq("unaffable")) == Seq("un", "##aff", "##able"))
    // greedy longest-first: 'aff' wins over 'a' at position 0
    assert(enc(v, Seq("affable")) == Seq("aff", "##able"))
    // dead end mid-word -> the WHOLE word is [UNK], not partial pieces
    assert(enc(v, Seq("unaffordable")) == Seq("[UNK]"))
    // position rule: continuation pieces can't start a word
    assert(enc(Seq("##a"), Seq("a")) == Seq("[UNK]"))
    assert(enc(Seq("a", "##a"), Seq("aaa")) == Seq("a", "##a", "##a"))
    // maxWordLen collapses long words
    assert(enc(v, Seq("unaffable"), maxWordLen = 5) == Seq("[UNK]"))
    // multiple words flatten in order; empty words skip
    assert(enc(v, Seq("able", "", "unaffable")) ==
      Seq("able", "un", "##aff", "##able"))
  }
}
