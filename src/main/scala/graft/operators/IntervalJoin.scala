package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-overlap) join with COMPLETE bucket blocking.
  *
  * Spark has no native range join: `l.start <= r.end AND r.start <= l.end`
  * alone plans as a BroadcastNestedLoopJoin — an all-pairs scan per key
  * that dies at scale. The classic fix (Flink/Trino/DataFusion all ship a
  * variant) is to quantize time into fixed-width buckets, replicate each
  * interval into every bucket it touches, and equi-join on
  * (keys, bucket): two overlapping intervals share at least one bucket,
  * so the equi-join plus the exact predicate is COMPLETE — no pair can be
  * missed. Each surviving pair would match once per shared bucket, so we
  * keep it only in the single bucket containing max(l.start, r.start):
  * that instant lies inside both intervals whenever they overlap, and
  * floor commutes with max, so `bucket == greatest(lb1, rb1)` attributes
  * every pair to exactly one bucket — no `distinct` pass.
  *
  * Scale shape: one shuffle per side on (keys, bucket); replication
  * factor is interval length / bucketWidth + 1, so pick `bucketWidth`
  * near the typical interval length. A row spanning more than
  * `maxSpanBuckets` buckets raises a loud executor-side error instead of
  * silently exploding the build side (the q110 cellW-refusal rule:
  * refuse, don't degrade).
  */
object IntervalJoin {

  /** Exact floor division for longs. Integer `div`, not Column `/`:
    * `/` is double division, and for |c| ≥ 2^53 (nanosecond epochs are
    * ~1.7e18) the quotient can round to the adjacent bucket — an
    * off-by-one on one side's b1/b2 breaks blocking completeness. pmod
    * makes the `div` a true floor for negative starts. */
  private def bdiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w)).cast("long")

  /** All (left, right) pairs with equal `keys` whose closed intervals
    * [lStart, lEnd] and [rStart, rEnd] intersect (touching endpoints
    * count). Null or inverted (end < start) intervals drop. Output:
    * keys ++ (a, b, o_start, o_end) with o_* the intersection bounds.
    */
  def overlap(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lId: String, lStart: String, lEnd: String,
      rId: String, rStart: String, rEnd: String,
      bucketWidth: Long, maxSpanBuckets: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")

    def side(df: DataFrame, id: String, st: String, en: String,
        p: String): DataFrame = {
      val b1 = bdiv(col(s"_${p}s"), bucketWidth)
      val b2 = bdiv(col(s"_${p}e"), bucketWidth)
      df.select(keys.map(col) :+ col(id).as(s"_${p}a") :+
          col(st).cast("long").as(s"_${p}s") :+
          col(en).cast("long").as(s"_${p}e"): _*)
        .where(col(s"_${p}s").isNotNull && col(s"_${p}e").isNotNull &&
          col(s"_${p}s") <= col(s"_${p}e"))
        .withColumn(s"_${p}b1", b1)
        .withColumn("_bk", explode(
          when(b2 - b1 >= lit(maxSpanBuckets.toLong),
            raise_error(concat(lit(s"IntervalJoin: interval spans > " +
              s"$maxSpanBuckets buckets of width $bucketWidth (id="),
              col(s"_${p}a").cast("string"),
              lit(s"); widen bucketWidth or raise maxSpanBuckets"))))
            .otherwise(sequence(b1, b2))))
    }

    val l = side(left, lId, lStart, lEnd, "l")
    val r = side(right, rId, rStart, rEnd, "r")
    l.join(r, keys :+ "_bk")
      .where(col("_bk") === greatest(col("_lb1"), col("_rb1")) &&
        col("_ls") <= col("_re") && col("_rs") <= col("_le"))
      .select(keys.map(col) :+ col("_la").as("a") :+ col("_ra").as("b") :+
        greatest(col("_ls"), col("_rs")).as("o_start") :+
        least(col("_le"), col("_re")).as("o_end"): _*)
  }

  /** Point-in-interval join: every (point, interval) pair with equal
    * `keys` and pStart <= point <= pEnd. A point sits in exactly one
    * bucket, so attribution is free — the equi-join on the point's
    * bucket plus the containment predicate emits each pair once.
    * Output: keys ++ (a = point id, b = interval id, t = point time). */
  def contains(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pId: String, pTime: String,
      iId: String, iStart: String, iEnd: String,
      bucketWidth: Long, maxSpanBuckets: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points
      .select(keys.map(col) :+ col(pId).as("_pa") :+
        col(pTime).cast("long").as("_pt"): _*)
      .where(col("_pt").isNotNull)
      .withColumn("_bk", bdiv(col("_pt"), bucketWidth))
    val b1 = bdiv(col("_is"), bucketWidth)
    val b2 = bdiv(col("_ie"), bucketWidth)
    val iv = intervals
      .select(keys.map(col) :+ col(iId).as("_ia") :+
        col(iStart).cast("long").as("_is") :+
        col(iEnd).cast("long").as("_ie"): _*)
      .where(col("_is").isNotNull && col("_ie").isNotNull &&
        col("_is") <= col("_ie"))
      .withColumn("_bk", explode(
        when(b2 - b1 >= lit(maxSpanBuckets.toLong),
          raise_error(concat(lit(s"IntervalJoin: interval spans > " +
            s"$maxSpanBuckets buckets of width $bucketWidth (id="),
            col("_ia").cast("string"),
            lit(s"); widen bucketWidth or raise maxSpanBuckets"))))
          .otherwise(sequence(b1, b2))))
    p.join(iv, keys :+ "_bk")
      .where(col("_is") <= col("_pt") && col("_pt") <= col("_ie"))
      .select(keys.map(col) :+ col("_pa").as("a") :+ col("_ia").as("b") :+
        col("_pt").as("t"): _*)
  }

  /** Exact per-key union coverage of half-open intervals [start, end) —
    * "how much wall-clock was this user/customer/device active", with
    * overlaps counted once. The sweep-line as ONE per-key window pass:
    * intervals sorted by (start, end), each row's novel coverage is
    *
    *   cov = max(0, end − max(start, runmax))
    *
    * where runmax = max(end) over all STRICTLY-PRECEDING rows — exactly
    * the nesting/overlap/gap trichotomy of the classic sweep. Summing
    * cov per key is traversal-order-invariant even under duplicate
    * intervals (a duplicate contributes 0 wherever it lands), so the
    * result is deterministic and externally replayable.
    *
    * Scale contract: ONE partitioned window over each key's intervals —
    * right for bounded per-key interval counts (sessions, orders); a
    * single key with hundreds of millions of intervals would need
    * pre-merging by time-bucket first. All arithmetic in exact longs.
    * Inverted/null intervals are dropped. Returns
    * (keys…, n_intervals, span_start, span_end, covered). */
  def unionLength(df: DataFrame, keys: Seq[String], start: Column,
      end: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = df
      .select(keys.map(col) :+ start.cast("long").as("_s") :+
        end.cast("long").as("_e"): _*)
      .where(col("_s").isNotNull && col("_e").isNotNull &&
        col("_s") < col("_e"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_s"), col("_e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("_cov",
        greatest(lit(0L), col("_e") -
          greatest(col("_s"), coalesce(max(col("_e")).over(w), col("_s")))))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        min("_s").as("span_start"), max("_e").as("span_end"),
        sum("_cov").as("covered"))
  }
}
