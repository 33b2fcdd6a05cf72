package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking / IR evaluation metrics over a binary-relevance array — the
  * reference's per-document metrics applied to `matches` vs ground truth
  * (reference: docarray/math/evaluation.py:14-168;
  * docarray/array/mixins/evaluation.py:15-87 zip-join + corpus mean).
  *
  * All metrics are pure Column expressions over `array<int>` (1 = relevant,
  * ordered by rank ascending) so they run inside whole-stage codegen, and
  * the corpus-level aggregate is a plain `avg`.
  */
object Evaluate {

  /** precision@k (reference: math/evaluation.py precision_at_k). */
  def precisionAtK(rel: Column, k: Int): Column =
    aggregate(slice(rel, 1, k), lit(0), _ + _).cast("double") / k

  /** r-precision: precision at R = number of relevant docs in the list
    * (reference: math/evaluation.py:14-31). */
  def rPrecision(rel: Column): Column = {
    val r = aggregate(rel, lit(0), _ + _)
    when(r === 0, lit(0.0))
      .otherwise(aggregate(slice(rel, lit(1), r), lit(0), _ + _).cast("double") / r)
  }

  /** hit@k: 1 if any of the first k is relevant. */
  def hitAtK(rel: Column, k: Int): Column =
    when(exists(slice(rel, 1, k), _ === 1), lit(1.0)).otherwise(lit(0.0))

  /** reciprocal rank of the first relevant hit (0 when none). */
  def reciprocalRank(rel: Column): Column = {
    val pos = array_position(rel, 1)
    when(pos === 0, lit(0.0)).otherwise(lit(1.0) / pos.cast("double"))
  }

  /** average precision over the list (reference: average_precision). */
  def averagePrecision(rel: Column): Column = {
    val n = size(rel)
    val hits = aggregate(rel, lit(0), _ + _)
    val summed = aggregate(
      sequence(lit(1), n, lit(1)),
      struct(lit(0).as("seen"), lit(0.0).as("ap")),
      (acc, i) => {
        val isRel = element_at(rel, i) === 1
        val seen = acc.getField("seen") + when(isRel, 1).otherwise(0)
        val ap = acc.getField("ap") +
          when(isRel, seen.cast("double") / i.cast("double")).otherwise(0.0)
        struct(seen.as("seen"), ap.as("ap"))
      },
      acc => acc.getField("ap"))
    when(hits === 0, lit(0.0)).otherwise(summed / hits.cast("double"))
  }

  /** recall@k given the total number of relevant docs for the query
    * (reference: recall_at_k(max_rel)). */
  def recallAtK(rel: Column, k: Int, totalRelevant: Column): Column =
    when(totalRelevant === 0, lit(0.0))
      .otherwise(aggregate(slice(rel, 1, k), lit(0), _ + _).cast("double") /
        totalRelevant.cast("double"))

  /** f1@k from precision@k and recall@k (reference: f1_score_at_k). */
  def f1AtK(rel: Column, k: Int, totalRelevant: Column): Column = {
    val p = precisionAtK(rel, k)
    val r = recallAtK(rel, k, totalRelevant)
    when(p + r === 0.0, lit(0.0)).otherwise(lit(2.0) * p * r / (p + r))
  }

  /** DCG@k with binary gains, log2 discount (reference: dcg_at_k). */
  def dcgAtK(rel: Column, k: Int): Column =
    aggregate(
      sequence(lit(1), least(lit(k), size(rel)), lit(1)),
      lit(0.0),
      (acc, i) => acc +
        element_at(rel, i).cast("double") /
          (log(i.cast("double") + 1.0) / log(lit(2.0))))

  /** NDCG@k: DCG normalized by the ideal (all relevant first). */
  def ndcgAtK(rel: Column, k: Int): Column = {
    val ideal = dcgAtK(array_sort(rel, (a, b) => b - a), k)
    when(ideal === 0.0, lit(0.0)).otherwise(dcgAtK(rel, k) / ideal)
  }

  /** Positional zip-join of a result set against ground truth by id
    * (reference: evaluation.py:40-64 alignment check + per-pair metric),
    * for DataFrames of (id, rel: array<int>). */
  def evaluate(results: DataFrame, idCol: String, relCol: String,
      metrics: Map[String, Column => Column]): DataFrame = {
    val cols = metrics.toSeq.map { case (name, fn) => fn(col(relCol)).as(name) }
    results.select(col(idCol) +: cols: _*)
  }

  /** `da.evaluate(groundtruth)`: align results to ground truth by id
    * (inner join — the reference asserts strict alignment,
    * evaluation.py:40-64) and turn each result's ranked match-id list into
    * a binary relevance array against the ground-truth match set. Feed the
    * result to the metric columns above; corpus mean = plain `avg`
    * (reference: evaluation.py:85-87). */
  def relevanceAgainst(results: DataFrame, groundTruth: DataFrame,
      idCol: String = "id", matchesCol: String = "matches"): DataFrame = {
    val gt = groundTruth.select(col(idCol).as("_gid"),
      col(matchesCol).as("_gt_matches"))
    results.select(col(idCol), col(matchesCol))
      .join(gt, col(idCol) === col("_gid"), "inner")
      .select(col(idCol),
        transform(col(matchesCol),
          m => when(array_contains(col("_gt_matches"), m), 1).otherwise(0))
          .as("rel"))
  }

  /** EXACT distributed ROC-AUC (Mann–Whitney rank-sum with average-rank
    * tie handling — the textbook definition, not a sampled estimate):
    * the probability that a uniformly random positive outscores a
    * uniformly random negative, with ties counting half. The classifier
    * eval for [[QualityClassifier]]-style keep rules at corpus scale.
    *
    * Scale shape: global rank positions come from
    * [[GroupOps.globalOrderIndex]] (range partition + zipWithIndex —
    * never a single-partition sort); tie groups collapse to one row per
    * DISTINCT score, and all rank arithmetic stays in integer
    * HALF-ranks (2·avgrank = 2·gmin + gcnt + 1), so the rank sums are
    * exact and summation-order-free — the single final division is the
    * only floating-point operation (exact while 2·P·N < 2^53), which
    * makes the whole statistic replayable bit-for-bit in an external
    * engine. Null scores/labels are dropped. Returns ONE row:
    * (n_pos, n_neg, auc — null when either class is empty). */
  def aucExact(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val base = df.select(score.as("_sc"), positive.cast("boolean").as("_pos"))
      .where(col("_sc").isNotNull && col("_pos").isNotNull)
    val idx = GroupOps.globalOrderIndex(base, "_gi", col("_sc"))
    idx.groupBy("_sc")
      .agg(min("_gi").as("_gmin"), count(lit(1)).as("_gcnt"),
        sum(col("_pos").cast("long")).as("_gpos"))
      .agg(sum("_gpos").as("n_pos"),
        (sum("_gcnt") - sum("_gpos")).as("n_neg"),
        sum(col("_gpos") * (lit(2L) * col("_gmin") + col("_gcnt") + 1))
          .as("_r2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("_r2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")))
          .as("auc"))
  }
}
