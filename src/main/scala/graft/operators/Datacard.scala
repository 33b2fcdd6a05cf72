package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset-card export — the release manifest a training corpus ships
  * with (HF dataset cards, Datasheets for Datasets): one JSON line per
  * source with exact integer statistics, plus a global header line.
  * The [[Projector]] discipline end to end: every line is assembled IN
  * THE PLAN from exact integers (no float ever reaches the file), the
  * driver only writes bounded artifact lines (a loud `maxSources`
  * valve), and the function RETURNS the artifact read back from disk
  * as (file, line_no, line) rows — the audit IS the return value, so a
  * gate can diff every byte against an independent recompute.
  *
  * Per source: doc count, null-text count, total/min/max character
  * length, the DOUBLED median length (`med2` = lo+hi order statistics
  * — exact integers, the robustZ convention), and the top language
  * with its floor-div ppm share (ties to the smaller lang string).
  * Length stats run over source-partitioned rank windows — scale-safe
  * at any per-source row count; only the ≤ maxSources summary rows
  * ever reach the driver.
  */
object Datacard {

  /** JSON-string escape for source/lang values: backslash, quote, and
    * the common control characters (\n \r \t — an embedded newline
    * would otherwise break both the JSON and the one-line-per-source
    * framing [[export]]'s readBack splits on). Any OTHER control
    * character < 0x20 raises loudly — a manifest key carrying \x07 is
    * dirty data the release should refuse, not quietly reframe. */
  private def esc(c: org.apache.spark.sql.Column) = {
    val ct = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(c,
        "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")
    when(ct.rlike("[\\x00-\\x1f]"), raise_error(concat(
        lit("datacard: unescapable control character in value: "), ct)))
      .otherwise(ct)
  }

  /** Write `datacard.jsonl` under `dir`; returns the artifact read
    * back as (file, line_no, line). */
  def export(df: DataFrame, sourceCol: String, textCol: String,
      langCol: String, dir: String, maxSources: Long = 10000L)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val base = df.select(col(sourceCol).as("_s"),
        col(textCol).as("_t"), col(langCol).as("_l"))
      .where(col("_s").isNotNull)
    val counts = base.groupBy("_s").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("_t").isNull, 1L).otherwise(0L)).as("null_text"),
      sum(coalesce(length(col("_t")).cast("long"), lit(0L)))
        .as("total_chars"),
      min(length(col("_t")).cast("long")).as("min_len"),
      max(length(col("_t")).cast("long")).as("max_len"))
    // doubled median of non-null lengths: lo + hi order statistics off
    // source-partitioned rank windows (the robustZ convention)
    val lens = base.where(col("_t").isNotNull)
      .select(col("_s"), length(col("_t")).cast("long").as("_len"))
    val wR = Window.partitionBy("_s").orderBy("_len")
    val wAll = Window.partitionBy("_s")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = lens
      .withColumn("_rn", row_number().over(wR))
      .withColumn("_cnt", count(lit(1)).over(wAll))
      .withColumn("_lo", floor((col("_cnt") + 1L) / 2L).cast("long"))
      .withColumn("_hi", floor(col("_cnt") / 2L).cast("long") + 1L)
      .where(col("_rn") === col("_lo") || col("_rn") === col("_hi"))
      .groupBy("_s")
      // a single middle row (odd count, lo == hi) doubles itself
      .agg((sum("_len") * when(countDistinct("_rn") === 1L, 2L)
        .otherwise(1L)).as("med2_len"))
    val topLang = base.where(col("_l").isNotNull)
      .groupBy("_s", "_l").agg(count(lit(1)).as("_lc"))
      .withColumn("_r", row_number().over(Window.partitionBy("_s")
        .orderBy(col("_lc").desc, col("_l").asc)))
      .where(col("_r") === 1)
      .select(col("_s"), col("_l").as("top_lang"), col("_lc"))
    val rows = counts.join(med, Seq("_s"), "left")
      .join(topLang, Seq("_s"), "left")
      .select(col("_s"), concat(
        lit("{\"source\":\""), esc(col("_s").cast("string")),
        lit("\",\"n_docs\":"), col("n_docs").cast("string"),
        lit(",\"null_text\":"), col("null_text").cast("string"),
        lit(",\"total_chars\":"), col("total_chars").cast("string"),
        lit(",\"min_len\":"),
        coalesce(col("min_len").cast("string"), lit("null")),
        lit(",\"med2_len\":"),
        coalesce(col("med2_len").cast("string"), lit("null")),
        lit(",\"max_len\":"),
        coalesce(col("max_len").cast("string"), lit("null")),
        lit(",\"top_lang\":"),
        when(col("top_lang").isNull, lit("null")).otherwise(concat(
          lit("\""), esc(col("top_lang").cast("string")), lit("\""))),
        lit(",\"top_lang_ppm\":"),
        coalesce(expr("(_lc * 1000000L) div n_docs").cast("string"),
          lit("null")),
        lit("}")).as("_line"))
    val global = base.agg(countDistinct(col("_s")).as("_ns"),
      count(lit(1)).as("_nd")).collect().head
    val nSources = global.getLong(0)
    require(nSources <= maxSources,
      s"datacard is a bounded release artifact: $nSources sources > " +
        s"maxSources=$maxSources — roll sources up first")
    val header = s"""{"datacard":"graft","n_sources":$nSources,""" +
      s""""n_docs":${global.getLong(1)}}"""
    val body = rows.orderBy(col("_s").cast("string"))
      .select("_line").collect().map(_.getString(0)).toSeq
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "datacard.jsonl"),
      ((header +: body).mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    readBack(spark, dir)
  }

  /** Re-read the artifact as (file, line_no, line) rows. */
  def readBack(spark: SparkSession, dir: String): DataFrame = {
    val p = Paths.get(dir, "datacard.jsonl")
    val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n", -1).toSeq
    val logical =
      if (lines.nonEmpty && lines.last.isEmpty) lines.init else lines
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        logical.zipWithIndex.map { case (l, i) =>
          Row("datacard.jsonl", i + 1, l)
        }, 1),
      StructType(Seq(
        StructField("file", StringType, nullable = false),
        StructField("line_no", IntegerType, nullable = false),
        StructField("line", StringType, nullable = false))))
  }
}
