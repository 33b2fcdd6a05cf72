package graft

import org.apache.spark.sql.functions._

import graft.functions.unigram_segment
import graft.operators.Unigram

/** Unigram-LM tokenizer: hand-traced integer Viterbi, tie rule, unk
  * coverage, seed counts, hard-EM pruning. */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private def seg(w: String, vocab: Seq[(String, Long)],
      unk: Long = 50000000L): (Long, Seq[String]) = {
    val r = Seq(w).toDF("w")
      .select(unigram_segment(col("w"), vocab, unk).as("s"))
      .select(col("s.cost_micro"), col("s.pieces")).head
    (r.getLong(0), r.getSeq[String](1))
  }

  test("unigram_segment: global min cost beats greedy, exact sums") {
    val vocab = Seq("ab" -> 10L, "c" -> 5L, "a" -> 8L, "b" -> 9L,
      "abc" -> 25L)
    // ab+c = 15 < a+b+c = 22 < abc = 25
    assert(seg("abc", vocab) == ((15L, Seq("ab", "c"))))
    assert(seg("ab", vocab) == ((10L, Seq("ab"))))
    assert(seg("", vocab) == ((0L, Seq())))
  }

  test("unigram_segment: cost ties pick the earliest split (longest final piece)") {
    val vocab = Seq("aa" -> 10L, "a" -> 5L)
    // all three segmentations of "aaa" cost 15; DP tie rule: at i=2
    // j=0 ("aa") beats j=1, at i=3 j=1 ("a"+"aa") beats j=2
    assert(seg("aaa", vocab) == ((15L, Seq("a", "aa"))))
  }

  test("unigram_segment: unknown chars fall back to unk singles, never fail") {
    val vocab = Seq("a" -> 5L)
    assert(seg("axa", vocab, unk = 100L) == ((110L, Seq("a", "x", "a"))))
    assert(seg("zz", vocab, unk = 7L) == ((14L, Seq("z", "z"))))
  }

  test("seedVocab: exact substring occurrence counts, char coverage, cap order") {
    val df = Seq("abab ab", "abab").toDF("text")
    // words (multiplicity): abab ×2, ab ×1
    // substrings len2: ab: 2·2+1=5 (hmm: abab has 'ab' at 0,2 -> 2 each),
    // ba: 2, len1: a: 2·2+1=5, b: 5
    val v = Unigram.seedVocab(df, col("text"), maxPieceLen = 2,
        minFreq = 2L, maxVocab = 1, maxWordLen = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1))).toMap
    // chars always kept; only ONE multi slot -> 'ab' (freq 5) beats 'ba'
    assert(v == Map("a" -> 5L, "b" -> 5L, "ab" -> 5L))
    // costs are round(-ln(freq/total)·1e6) of the kept table
    val c = Unigram.seedVocab(df, col("text"), 2, 2L, 1, 8)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = math.round(-math.log(5.0 / 15.0) * 1e6)
    assert(c("ab") == want && c("a") == want && c("b") == want)
  }

  test("hardEmStep prunes unused multi pieces, keeps char coverage; fit runs") {
    val df = Seq("abab abab", "ab").toDF("text")
    val seed = Unigram.seedVocab(df, col("text"), maxPieceLen = 4,
      minFreq = 2L, maxVocab = 10, maxWordLen = 8)
    val seedPieces = seed.select("piece").as[String].collect().toSet
    assert(seedPieces.contains("ba")) // present in the seed
    val v1 = Unigram.hardEmStep(df, col("text"), seed, maxWordLen = 8)
    val kept = v1.select("piece").as[String].collect().toSet
    // Viterbi decodes never USE 'ba' ('abab' splits as abab/ab+ab);
    // hard-EM drops it, chars stay
    assert(!kept.contains("ba"))
    assert(kept.contains("a") && kept.contains("b"))
    val fitted = Unigram.fit(df, col("text"), iters = 2, maxPieceLen = 4,
      minFreq = 2L, maxVocab = 10, maxWordLen = 8)
    assert(fitted.count() > 0)
    // decode table is deterministic across layouts
    val s1 = Unigram.segmentVocab(df, col("text"), fitted, 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val s2 = Unigram.segmentVocab(df.repartition(5), col("text"), fitted, 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(s1 == s2 && s1.nonEmpty)
  }
}
