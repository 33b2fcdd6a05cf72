package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer: corpus-scale TRAINING and a native
  * encode expression — the "train your own tokenizer on the corpus you
  * just cleaned" step of a pretraining pipeline (the reference stops at
  * text→tensor with a word vocabulary; BPE is the production tokenizer).
  *
  * Training is the classic two-phase shape (sentencepiece/GPT-2 style):
  *  1. the CORPUS-SCALE pass is one distributed aggregation — pre-token
  *     frequency counts over the whole corpus (map-side combined; this is
  *     the only step that touches every byte);
  *  2. the MODEL FIT runs on the aggregated (word, count) table — merge
  *     ranks depend only on those counts, so this is a driver-side loop
  *     over ≤ `maxWords` distinct pre-tokens, exactly like collecting
  *     k-means centroids: the model is small, the data was not.
  * Determinism: ties in pair frequency break lexicographically, so the
  * merge list is a pure function of the corpus.
  *
  * Encoding is [[graft.functions.BpeEncode]] — a scalar expression
  * carrying the merge ranks, applying the standard greedy lowest-rank
  * merge within each pre-token. Zero-shuffle, rides the scan projection.
  */
object Bpe {

  /** Distributed pre-token counts (phase 1). */
  def wordCounts(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(TextFunctions.bpeTokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Round-1 adjacent-pair counts over the corpus — the distributed twin
    * of the fit loop's first iteration (pair frequency = Σ word-count over
    * adjacent char pairs). The whole table is SQL-expressible, which is
    * what lets the corpus-scale machinery be oracle-gated even though the
    * iterative fit is not. */
  def pairCounts(df: DataFrame, textCol: Column): DataFrame =
    wordCounts(df, textCol)
      .where(length(col("w")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => struct(col("w").substr(i, lit(1)).as("a"),
          col("w").substr(i + 1, lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("n").as("cnt"))

  /** Train `numMerges` BPE merges. `maxWords` guards the driver-side fit —
    * raise it deliberately; a web corpus rarely exceeds ~10M distinct
    * pre-tokens, and the fit is O(maxWords · numMerges) worst case. */
  def train(df: DataFrame, textCol: Column, numMerges: Int,
      maxWords: Int = 5000000): Seq[(String, String)] = {
    val wc = wordCounts(df, textCol)
    // guard and collect in ONE job: collecting maxWords+1 rows both
    // detects the overflow and is the data we need — the old separate
    // limit-count probe re-ran the whole corpus aggregation twice
    val rows = wc.limit(maxWords + 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(rows.length <= maxWords,
      s"BPE fit input exceeds maxWords=$maxWords distinct pre-tokens; " +
        "raise maxWords to insist (fit is driver-side on the count table)")
    trainLocal(rows, numMerges)
  }

  /** The exact classic merge loop on a (word, count) table. Exposed for
    * tests; [[train]] is the corpus-facing entry. */
  private[graft] def trainLocal(wordCounts: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    // each word as an array of current symbols (one per CODE POINT —
    // per-char seeding would split astral characters into lone
    // surrogates; see BpeApply.codePointSymbols, same rule as encode)
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, n) =>
        (graft.functions.BpeApply.codePointSymbols(w), n)
      }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var m = 0
    while (m < numMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) return merges.toSeq
      // deterministic: count desc, then pair lexicographic
      val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      if (best._2 < 2) return merges.toSeq // nothing repeats; stop
      val (ba, bb) = best._1
      val merged = ba + bb
      words = words.map { case (syms, n) =>
        if (syms.length < 2) (syms, n)
        else {
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == ba && syms(i + 1) == bb) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
      }
      merges += ((ba, bb))
      m += 1
    }
    merges.toSeq
  }

  /** Vocabulary implied by a merge list over a corpus alphabet: all base
    * characters (from the merges plus any extras) then one entry per
    * merge, ids in rank order — the id space [[encodeIds]] emits. */
  def vocab(merges: Seq[(String, String)],
      baseChars: Seq[String] = Seq.empty): Seq[String] = {
    val base = (merges.flatMap { case (a, b) =>
      graft.functions.BpeApply.codePointSymbols(a + b) } ++
      baseChars).distinct.sorted
    base ++ merges.map { case (a, b) => a + b }
  }

  /** BPE token strings for a text column. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.bpe_encode(text, merges)

  /** BPE token ids (−1 for symbols outside `vocab` — unseen base chars). */
  def encodeIds(text: Column, merges: Seq[(String, String)],
      vocabList: Seq[String]): Column =
    graft.functions.bpe_encode_ids(text, merges, vocabList)
}
