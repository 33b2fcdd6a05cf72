package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several columns
  * into one sort key so that range-partitioning on it co-locates rows
  * that are close in EVERY dimension at once — the lakehouse layout
  * trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) that makes parquet
  * min/max stats prune multi-column range predicates, not just the
  * leading sort column.
  *
  * At 100 TB this is the difference between "filter on (a, b) reads
  * the `a` fraction of files" and "reads the `a`·`b` fraction": a
  * linear sort clusters one column and scatters the rest; the z-curve
  * bounds every dimension's per-file spread to ~2^-(bits-ceil(log2 F)/k).
  *
  * Everything is integer arithmetic on builtin expressions (shift/and/
  * or — codegen'd, engine-portable, oracle-replayable); no UDFs, no
  * custom layout service: the written artifact is plain parquet whose
  * pruning works in ANY reader that uses row-group stats.
  */
object ZOrder {

  /** Bit-interleave `cols` (non-negative ints < 2^bits each) into one
    * long: column `j` occupies bit positions `k·b + j`. k·bits must fit
    * a long (≤ 63). */
  def zvalue(bits: Int, cols: Column*): Column = {
    val k = cols.length
    require(k >= 1 && k * bits <= 63, s"k=$k × bits=$bits must be ≤ 63")
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), k * b + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Scale an integral column to [0, 2^bits) by its (min, max):
    * `floor((x - mn)·(2^bits - 1) / (mx - mn))`. The float division is
    * exact here: the numerator is an exact ≤2^47 integer and the true
    * quotient is ≥ 1/span > half-ulp away from any integer it isn't,
    * so `floor` equals integer division on every engine. `mn`/`mx`
    * ride a broadcast 1-row aggregate (see [[withZValue]]). */
  private def scaleToBits(c: Column, mn: Column, mx: Column,
      bits: Int): Column = {
    val span = mx.cast("long") - mn.cast("long")
    when(span <= 0, lit(0L)).otherwise(
      floor(((c.cast("long") - mn.cast("long")) * lit((1L << bits) - 1))
        .cast("double") / span.cast("double")).cast("long"))
  }

  /** Append a `_z` column: each named (integral) column min/max-scaled
    * to `bits` bits, then interleaved. One tiny extra aggregate for the
    * bounds (broadcast 1-row crossJoin — no driver hop, no second scan
    * thanks to plan reuse). */
  def withZValue(df: DataFrame, bits: Int, colNames: String*): DataFrame = {
    val aggs = colNames.flatMap(n =>
      Seq(min(col(n)).as(s"_mn_$n"), max(col(n)).as(s"_mx_$n")))
    val mm = df.agg(aggs.head, aggs.tail: _*)
    val scaled = colNames.map(n =>
      scaleToBits(col(n), col(s"_mn_$n"), col(s"_mx_$n"), bits))
    df.crossJoin(broadcast(mm))
      .withColumn("_z", zvalue(bits, scaled: _*))
      .drop(colNames.flatMap(n => Seq(s"_mn_$n", s"_mx_$n")): _*)
  }

  /** Write `df` as parquet clustered on the z-curve of `colNames`:
    * range-partition on `_z` into `nFiles` pieces, sort each piece,
    * drop the key. Point/range predicates on ANY prefix of the
    * clustered columns then prune at row-group granularity. */
  def writeZOrdered(df: DataFrame, path: String, nFiles: Int, bits: Int,
      colNames: String*): Unit =
    withZValue(df, bits, colNames: _*)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
