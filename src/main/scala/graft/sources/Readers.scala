package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.DocSchema

/** Ingestion operators → canonical doc tables
  * (reference: docarray/document/generators.py:26-316 from_ndarray /
  * from_files / from_csv / from_ndjson / from_lines;
  * docarray/array/mixins/io/ modules).
  *
  * Every reader is a Spark scan (splittable, predicate-pushdown-capable),
  * not a driver-side generator: the 100 TB versions of these are the same
  * calls pointed at object-store globs.
  */
object Readers {

  /** from_csv: header row maps to doc fields via field_resolver; unknown
    * columns land in `tags` (reference: generators.py:127-178,
    * io/csv.py:92-109; resolver semantics base.py:47-50). */
  def fromCsv(spark: SparkSession, path: String,
      fieldResolver: Map[String, String] = Map.empty): DataFrame =
    DocSchema.fromColumns(
      spark.read.option("header", "true").csv(path), fieldResolver)

  /** from_ndjson: line-delimited JSON (reference: generators.py:237-271). */
  def fromJsonl(spark: SparkSession, path: String,
      fieldResolver: Map[String, String] = Map.empty): DataFrame =
    DocSchema.fromColumns(spark.read.json(path), fieldResolver)

  /** from_lines: one text doc per line (reference: generators.py:272-316). */
  def fromLines(spark: SparkSession, path: String): DataFrame =
    DocSchema.fromColumns(
      spark.read.text(path).withColumnRenamed("value", "text"))

  /** from_files: glob → docs with uri + optional loaded content
    * (reference: generators.py:56-126). Spark's binaryFile source yields
    * (path, modificationTime, length, content). */
  def fromFiles(spark: SparkSession, glob: String,
      loadContent: Boolean = true, mimeFromExtension: Boolean = true,
      excludeRegex: Option[String] = None, samplingRate: Double = 1.0,
      size: Option[Int] = None, toDataUri: Boolean = false,
      seed: Long = 42L): DataFrame = {
    // option parity with from_files (generators.py:56-126): exclude_regex
    // drops matching paths, sampling_rate subsamples (here deterministic
    // by path hash, not random.random — reproducible across runs), size
    // caps the count, to_dataturi swaps uri for a data URI of the blob
    val raw0 = spark.read.format("binaryFile").load(glob)
    val raw1 = excludeRegex.fold(raw0)(re => raw0.where(!col("path").rlike(re)))
    val raw2 =
      if (samplingRate >= 1.0) raw1
      else raw1.where(pmod(xxhash64(col("path"), lit(seed)), lit(1000000L))
        < (samplingRate * 1000000L).toLong)
    // size truncates in deterministic listing order (orderBy path), like
    // the reference's from_files — a bare limit would keep a
    // partition/plan-dependent subset
    val raw = size.fold(raw2)(n => raw2.orderBy(col("path")).limit(n))
    val withCols = raw.select(
      col("path").as("uri"),
      (if (loadContent) col("content") else lit(null).cast("binary")).as("blob"),
      (if (mimeFromExtension)
         when(col("path").rlike("(?i)\\.png$"), "image/png")
           .when(col("path").rlike("(?i)\\.jpe?g$"), "image/jpeg")
           .when(col("path").rlike("(?i)\\.gif$"), "image/gif")
           .when(col("path").rlike("(?i)\\.wav$"), "audio/wav")
           .when(col("path").rlike("(?i)\\.mp4$"), "video/mp4")
           .when(col("path").rlike("(?i)\\.txt$"), "text/plain")
           .when(col("path").rlike("(?i)\\.json$"), "application/json")
           .otherwise("application/octet-stream")
       else lit("")).as("mime_type"))
    val shaped = DocSchema.fromColumns(withCols)
    if (!toDataUri) shaped
    else shaped.withColumn("uri",
      graft.operators.Multimodal.toDataUri(col("blob"), col("mime_type")))
  }

  /** Rows of an in-memory matrix → docs with embeddings
    * (reference: generators.py:26-55 from_ndarray). */
  def fromMatrix(spark: SparkSession, matrix: Seq[Array[Float]]): DataFrame = {
    import spark.implicits._
    DocSchema.fromColumns(
      matrix.zipWithIndex.toDF("embedding", "row_idx")
        .select(col("row_idx").cast("string").as("id"), col("embedding")))
  }

  /** Native persistent store = parquet (reference's stores are
    * sqlite/annlite/... CRUD backends under array/storage/; our durable table
    * is a columnar file format with pushdown + partition pruning). */
  def fromParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

/** Export operators (reference: io/csv.py save_csv flatten_tags → `tag__k`
  * columns, io/json.py to_json, binary.py save_binary → parquet here). */
object Writers {

  /** save_csv with flatten_tags: promote each tag key to a `tag__k` column
    * (reference: io/csv.py:35-89). Tag keys are discovered from the data —
    * at scale pass them explicitly to avoid the extra pass. */
  def toCsv(df: DataFrame, path: String, flattenTags: Boolean = true,
      tagKeys: Seq[String] = Nil): Unit = {
    val out = if (!flattenTags || !df.columns.contains("tags")) df
    else {
      val keys = if (tagKeys.nonEmpty) tagKeys
        else df.select(explode(map_keys(col("tags"))))
          .distinct().collect().map(_.getString(0)).toSeq.sorted
      val flat = keys.foldLeft(df) { (d, k) =>
        d.withColumn(s"tag__$k", col("tags").getItem(k))
      }
      flat.drop("tags")
    }
    // drop non-csv-able nested columns
    val csvable = out.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.MapType => false
      case _: org.apache.spark.sql.types.StructType => false
      case org.apache.spark.sql.types.BinaryType => false
      case _ => true
    }).map(_.name)
    out.select(csvable.head, csvable.tail: _*)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  def toJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Partitioned parquet — the scale-native `save_binary`. Partition by a
    * low-cardinality column (e.g. a promoted tag) for pruning. */
  def toParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
