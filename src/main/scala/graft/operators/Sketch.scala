package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{fnv64, kmv_estimate, kmv_sketch, splitmix64_rank}

/** KMV (bottom-k minimum values) distinct-count sketches: bounded-memory,
  * mergeable cardinality estimation over arbitrary keys — vocabulary size,
  * unique URLs/domains/n-grams per corpus slice at 100 TB, where an exact
  * `count(distinct)` would shuffle every distinct key.
  *
  * The hash space is the engine-portable FNV-1a → splitmix64 chain already
  * gated by q46/q52, so a sketch is replayable bit-for-bit in an external
  * SQL engine, and the estimate — (k−1)·2^64 / kth-minimum-unsigned-hash,
  * exact integer floor division ([[graft.functions.KmvEstimate]]) — is
  * deterministic and layout-invariant.
  *
  * Scale shape: ONE aggregation ([[graft.functions.KmvSketchAgg]] — a
  * bounded distinct-bottom-k buffer, dedup inside the heap) with map-side
  * combine, so the only shuffle moves ≤ k longs per (partition, group) —
  * no separate distinct pass, no per-group sort, no window. Sketches
  * (bottom-k arrays) union losslessly: the bottom-k of a union is a
  * function of the per-part bottom-k's, which makes per-shard/per-day
  * sketch artifacts combinable without re-reading the data.
  */
object Sketch {

  /** Engine-portable 64-bit hash of a string key: splitmix64(fnv64(key) + seed). */
  def keyHash(key: Column, seed: Long = 0L): Column =
    splitmix64_rank(fnv64(key), seed)

  // signed ↔ unsigned order flip: XOR the sign bit, then signed order on the
  // flipped value equals unsigned order on the original (both engines).
  private def flip(c: Column): Column = c.bitwiseXOR(lit(Long.MinValue))

  /** Materialized sketch artifact: per group ONE row with `kmv` = the
    * distinct bottom-k signed hashes in ascending unsigned order (≤ k
    * elements). One aggregation, one bounded shuffle. Store per
    * shard/day; [[kmvMerge]] combines without data re-reads. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], hash: Column,
      k: Int): DataFrame =
    df.select(groupCols.map(col) :+ hash.as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv_sketch(col("_h"), k).as("kmv"))

  /** Per-group bottom-k rows of distinct (unsigned) hashes: (groupCols…,
    * `_h`) with at most k rows per group — [[kmvSketch]] exploded. */
  def kmvBottomK(df: DataFrame, groupCols: Seq[String], hash: Column,
      k: Int): DataFrame =
    kmvSketch(df, groupCols, hash, k)
      .select(groupCols.map(col) :+ explode(col("kmv")).as("_h"): _*)

  /** Distinct-count estimate per group: (groupCols…, k_actual, kth_hash,
    * est_distinct). Groups with fewer than k distinct hashes report the
    * exact count (the sketch saw everything); otherwise the KMV estimator
    * fires on the kth minimum. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], hash: Column,
      k: Int): DataFrame =
    kmvSketch(df, groupCols, hash, k)
      .select((groupCols.map(col) :+
        size(col("kmv")).cast("long").as("k_actual") :+
        // a group whose hashes were all null has an EMPTY sketch —
        // element_at(kmv, 0) would throw; its kth hash is simply absent
        when(size(col("kmv")) > 0,
          element_at(col("kmv"), size(col("kmv")))).as("kth_hash")): _*)
      .withColumn("est_distinct",
        when(col("k_actual") < k, col("k_actual"))
          .otherwise(kmv_estimate(col("kth_hash"), k)))

  /** String-key convenience: hash with [[keyHash]] then [[kmvDistinct]]. */
  def kmvDistinctStrings(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int, seed: Long = 0L): DataFrame =
    kmvDistinct(df, groupCols, keyHash(key, seed), k)

  /** Bottom-k (unsigned order) of an array of signed hashes: the single
    * definition both [[kmvMerge]] and [[kmvJaccard]] build on — one
    * sign-flip/sort/unflip encoding, not two drifting copies. */
  private def unionBottomK(arr: Column, k: Int): Column =
    slice(
      transform(
        sort_array(array_distinct(transform(arr,
          x => x.bitwiseXOR(lit(Long.MinValue))))),
        x => x.bitwiseXOR(lit(Long.MinValue))),
      1, k)

  /** Union sketches that share a group key: lossless bottom-k of the union
    * of the per-part bottom-k arrays (distinct, unsigned sort, cut at k). */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(unionBottomK(flatten(collect_list(col("kmv"))), k).as("kmv"))

  /** Estimate column over a sketch array (from [[kmvSketch]]/[[kmvMerge]]). */
  def kmvEstimateFromSketch(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(kmv_estimate(element_at(kmv, k), k))

  /** Jaccard similarity estimate between two bottom-k sketches (Beyer et
    * al. 2007): over M = the bottom-k of the sketch union (an unbiased
    * uniform sample of A ∪ B), J ≈ |{m ∈ M : m ∈ A_k ∧ m ∈ B_k}| / |M|.
    * Deterministic (no RNG — the "sample" is the hash order) and exact
    * rational → one double division, so an external engine replays it
    * bit-for-bit. This is the cross-corpus overlap/contamination-rate
    * estimator that needs NO join of the raw data — two k-long arrays
    * per corpus slice, composable over [[kmvMerge]]d shards. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val union = unionBottomK(concat(a, b), k)
    val inBoth = size(filter(union,
      x => array_contains(a, x) && array_contains(b, x)))
    when(size(union) === 0, lit(0.0))
      .otherwise(inBoth.cast("double") / size(union).cast("double"))
  }

  /** All-pairs overlap estimates between the groups of a sketch table
    * (from [[kmvSketch]]): (ga, gb, jaccard) for every unordered group
    * pair — |G|² sketch-array comparisons, never a data join. */
  def kmvOverlapPairs(sketches: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("ga"), col("kmv").as("_ka"))
    val b = sketches.select(col(groupCol).as("gb"), col("kmv").as("_kb"))
    a.crossJoin(b).where(col("ga") < col("gb"))
      .select(col("ga"), col("gb"),
        kmvJaccard(col("_ka"), col("_kb"), k).as("jaccard"))
  }
}
