package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{fnv64, text_ngrams}

/** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): select pretraining
  * documents that look like a small target corpus by scoring each raw
  * document under a pair of cheap hashed-n-gram bag models.
  *
  * Features are word unigrams + bigrams hashed into `buckets` cells
  * (the paper's hashed n-gram generative model). Each bucket gets a
  * log importance ratio `ln p_target(b) - ln p_raw(b)` (add-one
  * smoothed); a document's weight is the sum of its bucket counts
  * times the per-bucket log ratio — its log-likelihood ratio under
  * the two models.
  *
  * Beyond-reference training-pipeline operator (the reference has no
  * corpus-selection surface); sits beside [[LangModel]] (perplexity
  * filtering) and [[GroupOps.sampleTemperature]] (source mixing).
  *
  * Scale shape: both models ARE DataFrames keyed by bucket (at most
  * `buckets` rows — broadcastable), never driver-side; corpus totals
  * ride along as a broadcast 1-row aggregate. Scoring is one explode +
  * one groupBy(doc, bucket) + one bucket join + one groupBy(doc):
  * shuffles on (doc, bucket) and doc only, partial-aggregated map-side.
  * Everything is codegen'd builtins — no UDFs.
  *
  * Determinism: the per-bucket log ratio is the ONLY float in the
  * pipeline; it is rounded once to 6 dp (the q60 float rule) and cast
  * to DECIMAL(18,6), so each document's weight is an exact decimal
  * dot-product — summation-order-independent and replayable bit-for-bit
  * by an external SQL engine through the same FNV-1a chain.
  */
object Dsir {

  /** Per-document hashed-feature bucket counts:
    * (idCol, `bucket`, `cnt`). Features = word unigrams + bigrams
    * (single-space joined, same tokenizer as the rest of the text
    * stack); bucket = pmod(fnv64(feature), buckets). */
  def bucketCounts(docs: DataFrame, idCol: String, textCol: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    docs
      .select(col(idCol),
        explode(concat(text_ngrams(textCol, 1), text_ngrams(textCol, 2)))
          .as("_feat"))
      .select(col(idCol),
        pmod(fnv64(col("_feat")), lit(buckets.toLong)).cast("int").as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Importance weight for every document of `raw` toward the
    * distribution of `target`: (idCol, `n_feats`, `weight`), where
    * `weight = Σ_b cnt_b · round(ln((tn_b+1)/(T+B)) − ln((rn_b+1)/(R+B)), 6)`
    * with `rn`/`tn` the corpus bucket counts, `R`/`T` their totals and
    * `B = buckets` (add-one smoothing on both models). Higher = more
    * target-like. Docs with no features get no row (nothing to score). */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: Column, buckets: Int): DataFrame = {
    val perDoc = bucketCounts(raw, idCol, textCol, buckets)
    val rawModel = perDoc.groupBy("bucket").agg(sum(col("cnt")).as("rn"))
    val tgtModel = bucketCounts(target, idCol, textCol, buckets)
      .groupBy("bucket").agg(sum(col("cnt")).as("tn"))
    val totals = rawModel
      .agg(sum(col("rn")).as("_R"))
      .crossJoin(tgtModel.agg(coalesce(sum(col("tn")), lit(0L)).as("_T")))
    val b = lit(buckets.toDouble)
    // every bucket a raw doc can hit is present in rawModel by construction,
    // so a left join from the raw side loses nothing
    val logRatio = rawModel
      .join(tgtModel, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((coalesce(col("tn"), lit(0L)) + lit(1L)).cast("double") /
              (col("_T").cast("double") + b)) -
          log((col("rn") + lit(1L)).cast("double") /
              (col("_R").cast("double") + b)),
          6).cast(DecimalType(18, 6)).as("lr"))
    perDoc
      .join(logRatio, Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("lr")).as("_w"))
      .select(col(idCol), col("n_feats"), col("_w").cast("double").as("weight"))
  }

  /** Deterministic resample: the `k` highest-weight documents (ties
    * broken by id). orderBy+limit → TakeOrderedAndProject: a bounded
    * per-partition heap + driver merge of k rows, never a global sort. */
  def resampleTop(weights: DataFrame, idCol: String, k: Int): DataFrame =
    weights.orderBy(col("weight").desc, col(idCol)).limit(k)
}
