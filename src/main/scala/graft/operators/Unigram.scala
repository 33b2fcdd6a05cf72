package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{unigram_segment, TextFunctions}

/** Unigram-LM subword tokenizer (Kudo, ACL 2018 — the SentencePiece
  * unigram algorithm), completing the trainer trio beside BPE
  * ([[Bpe]]) and WordPiece: a piece VOCABULARY with fixed-point costs
  * (micro-nats, round(−ln p · 1e6) quantized once per train step), a
  * global-optimum integer Viterbi [[graft.functions.UnigramSegment]]
  * decode, and hard-EM refit rounds (Viterbi-EM: segment under the
  * current costs, recount actually-used pieces, recost — the
  * deterministic variant of the paper's soft E-step, every decision
  * engine-replayable).
  *
  * All frequencies and DP sums are exact integers; the ONE float op
  * per train step is the −ln(freq/total) per piece, quantized to
  * micro immediately (the repo's quantize-once rule). Single
  * characters are always in the vocab (full coverage — segmentation
  * never fails), multi-char candidates compete for `maxVocab` slots
  * by (freq desc, piece asc).
  *
  * Scale shape: seed/refit are token-explode → bounded substring
  * explode (≤ maxWordLen · maxPieceLen rows per token) → map-side
  * combined counts; decode is a zero-shuffle map with the vocab
  * riding the plan (guarded driver collect, ≤ maxVocab + alphabet
  * rows — the [[LangModel]] guarded-fit pattern). */
object Unigram {

  /** Seed vocabulary: every substring of length 2..maxPieceLen with
    * ≥ minFreq occurrences competes for `maxVocab` slots; ALL single
    * chars are kept unconditionally. Words are lowercased alnum runs
    * truncated to `maxWordLen` (the documented DP-length contract).
    * Returns (piece, freq, cost_micro). */
  def seedVocab(df: DataFrame, textCol: Column, maxPieceLen: Int = 4,
      minFreq: Long = 2L, maxVocab: Int = 1000,
      maxWordLen: Int = 32): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    require(maxWordLen >= 1, s"maxWordLen must be >= 1, got $maxWordLen")
    val toks = words(df, textCol, maxWordLen)
    val pieces = toks
      .select(col("_w"), explode(sequence(lit(1), length(col("_w"))))
        .as("_s"))
      .select(col("_w"), col("_s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("_l"))
      .where(col("_s") + col("_l") - 1 <= length(col("_w")))
      .select(substring(col("_w"), col("_s"), col("_l")).as("piece"),
        col("_l"))
      .groupBy("piece", "_l").agg(count(lit(1)).as("freq"))
    val chars = pieces.where(col("_l") === 1).select("piece", "freq")
    val multi = pieces.where(col("_l") > 1 && col("freq") >= minFreq)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("piece").asc)))
      .where(col("_rn") <= maxVocab)
      .select("piece", "freq")
    withCosts(chars.unionByName(multi))
  }

  /** One hard-EM (Viterbi-EM) refit: decode every word under the
    * current costs, recount the pieces actually used, recost. Single
    * chars keep coverage via max(freq, 1); unused multi-char pieces
    * drop. Returns the new (piece, freq, cost_micro) vocab. */
  def hardEmStep(df: DataFrame, textCol: Column, vocab: DataFrame,
      maxWordLen: Int = 32, maxVocab: Int = 1000000): DataFrame = {
    val used = segmentWords(words(df, textCol, maxWordLen), vocab, maxVocab)
      .select(explode(col("_seg.pieces")).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("freq"))
    val chars = vocab.where(length(col("piece")) === 1)
      .select(col("piece"))
      .join(used, Seq("piece"), "left")
      .select(col("piece"), greatest(coalesce(col("freq"), lit(0L)), lit(1L))
        .as("freq"))
    val multi = used.where(length(col("piece")) > 1)
    withCosts(chars.unionByName(multi))
  }

  /** Seed + `iters` hard-EM rounds. */
  def fit(df: DataFrame, textCol: Column, iters: Int,
      maxPieceLen: Int = 4, minFreq: Long = 2L, maxVocab: Int = 1000,
      maxWordLen: Int = 32): DataFrame = {
    var v = seedVocab(df, textCol, maxPieceLen, minFreq, maxVocab,
      maxWordLen)
    for (_ <- 0 until iters)
      v = hardEmStep(df, textCol, v, maxWordLen)
    v
  }

  /** Viterbi decode of every token of `textCol` under `vocab`:
    * one row per token occurrence with the min-cost segmentation.
    * Returns df's columns + (word, cost_micro, pieces). */
  def segment(df: DataFrame, textCol: Column, vocab: DataFrame,
      maxWordLen: Int = 32, maxVocab: Int = 1000000): DataFrame = {
    val seg = unigram_segment(col("_w"), collectVocab(vocab, maxVocab))
    df.select(col("*"),
        explode(TextFunctions.tokens(textCol)).as("_w0"))
      .select(col("*"), substring(col("_w0"), 1, maxWordLen).as("_w"))
      .withColumn("_seg", seg)
      .select(df.columns.map(col) :+ col("_w").as("word") :+
        col("_seg.cost_micro").as("cost_micro") :+
        col("_seg.pieces").as("pieces"): _*)
  }

  /** Per-distinct-word decode table (the gate shape): (word,
    * cost_micro, n_pieces, pieces). */
  def segmentVocab(df: DataFrame, textCol: Column, vocab: DataFrame,
      maxWordLen: Int = 32, maxVocab: Int = 1000000): DataFrame =
    segmentWords(words(df, textCol, maxWordLen).distinct(), vocab,
        maxVocab)
      .select(col("_w").as("word"),
        col("_seg.cost_micro").as("cost_micro"),
        size(col("_seg.pieces")).as("n_pieces"),
        col("_seg.pieces").as("pieces"))

  // ----------------------------------------------------------------

  private def words(df: DataFrame, textCol: Column,
      maxWordLen: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(textCol)).as("_w0"))
      .select(substring(col("_w0"), 1, maxWordLen).as("_w"))

  private def segmentWords(ws: DataFrame, vocab: DataFrame,
      maxVocab: Int): DataFrame =
    ws.withColumn("_seg",
      unigram_segment(col("_w"), collectVocab(vocab, maxVocab)))

  /** Guarded driver collect of (piece, cost_micro) — the vocab rides
    * the plan as an expression literal table. */
  private def collectVocab(vocab: DataFrame,
      maxVocab: Int): Seq[(String, Long)] = {
    val rows = vocab.select(col("piece"), col("cost_micro"))
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"vocab exceeds the $maxVocab guarded-collect bound")
    rows.map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** cost_micro = round(−ln(freq / total) · 1e6), total over the kept
    * vocab — the single quantize-once float chain of a train step. */
  private def withCosts(kept: DataFrame): DataFrame = {
    val tot = kept.agg(coalesce(sum("freq"), lit(0L)).as("_tot"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("freq"),
        round(-log(col("freq").cast("double") /
          col("_tot").cast("double")) * 1e6).cast("long").as("cost_micro"))
  }
}
