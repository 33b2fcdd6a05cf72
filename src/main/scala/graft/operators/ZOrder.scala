package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

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
    * `floor((x - mn)·(2^bits - 1) / (mx - mn))`. Wide-range columns
    * (epoch micros: span ~2^50) would overflow the ×(2^bits−1) product
    * and exceed double's exact-integer range, so offsets and span are
    * first right-shifted until the span fits 2^37 — a loss of bits the
    * quantization was about to throw away anyway (bits ≤ 21 kept).
    * After the shift the numerator is an exact ≤2^53 integer and the
    * true quotient is ≥ 1/span > half-ulp from any integer it isn't,
    * so the double `floor` equals integer division on every engine.
    * `mn`/`mx` ride a broadcast 1-row aggregate (see [[withZValue]]). */
  private def scaleToBits(c: Column, mn: Column, mx: Column,
      bits: Int): Column = {
    val span = mx.cast("long") - mn.cast("long")
    // shift = max(0, floor(log2 span) − (52−bits)): after it,
    // span >> shift < 2^(53−bits), so (off × (2^bits−1)) ≤ 2^53 exactly.
    // (functions.shiftright only takes a literal count — use the
    // Catalyst expression for the column-valued shift)
    def shr(x: Column, n: Column): Column = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftRight(
        Bridge.expression(x), Bridge.expression(n)))
    val shift = greatest(lit(0),
      (floor(log2(span.cast("double"))) - lit(52 - bits)).cast("int"))
    val off = shr(c.cast("long") - mn.cast("long"), shift)
    val spanS = shr(span, shift)
    when(span <= 0, lit(0L)).otherwise(
      floor((off * lit((1L << bits) - 1)).cast("double") /
        spanS.cast("double")).cast("long"))
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

  /** Hilbert index of two pre-scaled columns (see
    * [[graft.functions.HilbertIndex2]]): the better-locality 2-D
    * alternative to [[zvalue]] — consecutive keys are always
    * Manhattan-adjacent cells, so equal-size key ranges cover tighter
    * spatial blobs than the z-curve's seam-jumping ranges. */
  def hvalue(bits: Int, x: Column, y: Column): Column =
    Bridge.column(graft.functions.HilbertIndex2(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")),
      bits))

  /** Append a `_h` Hilbert key over two columns — [[withZValue]]'s
    * twin (same min/max scaling, same broadcast bounds row). */
  def withHValue(df: DataFrame, bits: Int, xName: String,
      yName: String): DataFrame = {
    val mm = df.agg(min(col(xName)).as("_mn_x"), max(col(xName)).as("_mx_x"),
      min(col(yName)).as("_mn_y"), max(col(yName)).as("_mx_y"))
    df.crossJoin(broadcast(mm))
      .withColumn("_h", hvalue(bits,
        scaleToBits(col(xName), col("_mn_x"), col("_mx_x"), bits),
        scaleToBits(col(yName), col("_mn_y"), col("_mx_y"), bits)))
      .drop("_mn_x", "_mx_x", "_mn_y", "_mx_y")
  }

  /** [[writeZOrdered]] on the Hilbert key. */
  def writeHilbertOrdered(df: DataFrame, path: String, nFiles: Int,
      bits: Int, xName: String, yName: String): Unit =
    withHValue(df, bits, xName, yName)
      .repartitionByRange(nFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
      .write.mode("overwrite").parquet(path)

  /** Compaction plan for the small-files problem: assign every file to
    * an output bin of ~`targetBytes` by NEXT-FIT over a deterministic
    * total order (sortCol asc — path for locality, or size for tighter
    * packing): bin(f) = floor(bytes-before-f / target), i.e. bins are
    * contiguous byte ranges of the ordered listing. A bin can overrun
    * by at most one file (the next-fit contract — deterministic and
    * engine-replayable, unlike first-fit-decreasing whose sequential
    * state doesn't distribute); files ≥ target land alone. One window
    * prefix-sum over the listing — the listing is metadata (one row
    * per FILE, not per data row), so a single window partition is the
    * correct altitude up to tens of millions of files; shard the
    * window by a directory prefix above that.
    * Returns the input + (bin, bin_bytes, bin_files). */
  def compactionPlan(files: DataFrame, pathCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(col(pathCol).asc)
    val before = coalesce(
      sum(col(bytesCol)).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val planned = files.withColumn("bin",
      call_function("div", before, lit(targetBytes)))
    val byBin = planned.groupBy("bin")
      .agg(sum(col(bytesCol)).as("bin_bytes"),
        count(lit(1)).as("bin_files"))
    planned.join(byBin, "bin")
  }
}
