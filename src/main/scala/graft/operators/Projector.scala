package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TensorBoard Embedding Projector export — the artifact half of the
  * reference's `plot_embeddings` (reference: docarray/array/mixins/
  * plot.py:125-210): `vectors.tsv` (tab-separated components, no
  * header), `metadata.tsv` (single label column → no header; several →
  * header row, per the projector's format rules), and
  * `projector_config.pbtxt` pointing at both. The browser-side display
  * is OOS; the on-disk artifact is byte-deterministic and gated.
  *
  * Scale shape: the projector is a BROWSER-loaded artifact with a
  * practical ceiling around 1e5 points, so this is a driver-bounded
  * export BY DESIGN — a loud `maxRows` valve guards the collect; a
  * 100 TB corpus must funnel through a gated sampler first
  * (`GroupOps.sample`, k-means coresets) exactly as a user of the
  * reference would subsample before `plot_embeddings`. Rows are
  * ordered by the id column, so the artifact is layout-invariant.
  *
  * `quantPpm = true` writes each component as the exact ppm integer
  * `round(x·10⁶)` (the q298 quantization — engine-portable and
  * byte-stable; a uniform scale change preserves every cosine and
  * every euclidean ORDER, so the projector view is unchanged).
  * Default writes the float's shortest decimal representation.
  */
object Projector {

  private val configLines = Seq(
    "embeddings {",
    "  tensor_name: \"embeddings\"",
    "  tensor_path: \"vectors.tsv\"",
    "  metadata_path: \"metadata.tsv\"",
    "}")

  /** Write the three projector files under `dir`; returns the artifact
    * READ BACK from disk as (file, line_no, line) rows — the audit IS
    * the return value (the q259 artifact-gate pattern). */
  def exportEmbeddings(df: DataFrame, idCol: String, vecCol: String,
      labelCols: Seq[String], dir: String, maxRows: Long = 100000L,
      quantPpm: Boolean = false): DataFrame = {
    require(labelCols.nonEmpty, "need at least one metadata label column")
    val spark = df.sparkSession
    val base = df.where(col(vecCol).isNotNull)
    val n = base.count()
    require(n <= maxRows,
      s"projector export is a browser-bounded artifact: $n rows > " +
        s"maxRows=$maxRows — sample/coreset upstream first")

    // components stringified IN THE PLAN (codegen, and for ppm the
    // exact q298 round chain), so the driver only joins lines
    val compStr =
      if (quantPpm)
        transform(col(vecCol),
          x => round(x.cast("double") * 1e6).cast("long").cast("string"))
      else transform(col(vecCol), x => x.cast("string"))
    val rows = base
      .select(col(idCol),
        concat_ws("\t", compStr).as("_vec"),
        concat_ws("\t", labelCols.map(c => col(c).cast("string")): _*)
          .as("_meta"))
      .orderBy(col(idCol))
      .select("_vec", "_meta")
      .collect() // bounded by the maxRows valve above

    Files.createDirectories(Paths.get(dir))
    def write(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(dir, name),
        (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    write("vectors.tsv", rows.map(_.getString(0)).toSeq)
    val metaHeader =
      if (labelCols.length > 1) Seq(labelCols.mkString("\t")) else Nil
    write("metadata.tsv", metaHeader ++ rows.map(_.getString(1)))
    write("projector_config.pbtxt", configLines)
    readBack(spark, dir)
  }

  /** Re-read the three artifact files as (file, line_no, line) rows —
    * byte-level evidence the export landed (driver-side read of files
    * the valve already bounded). */
  def readBack(spark: SparkSession, dir: String): DataFrame = {
    val out = Seq("vectors.tsv", "metadata.tsv", "projector_config.pbtxt")
      .flatMap { name =>
        val p = Paths.get(dir, name)
        val lines = new String(Files.readAllBytes(p),
          StandardCharsets.UTF_8).split("\n", -1).toSeq
        // the writer ends the file with one trailing \n — drop the
        // empty tail split so line counts are the logical line counts
        val logical =
          if (lines.nonEmpty && lines.last.isEmpty) lines.init else lines
        logical.zipWithIndex.map { case (l, i) => Row(name, i + 1, l) }
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("file", StringType, nullable = false),
        StructField("line_no", IntegerType, nullable = false),
        StructField("line", StringType, nullable = false))))
  }
}
