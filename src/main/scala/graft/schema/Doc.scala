package graft.schema

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical document data model.
  *
  * Mirrors the reference's 18-field Document schema
  * (reference: docarray/document/data.py:41-63, docarray/proto/docarray.proto:63-123)
  * re-expressed as a Spark StructType. Two representations:
  *
  *  1. Nested, bounded depth: `chunks`/`matches` are `array<struct<Doc>>`
  *     generated to a fixed depth (default 2 — covers every traversal path the
  *     reference's tests exercise: r, c, cc, m, mm, cm;
  *     reference: docarray/array/mixins/traverse.py:95-102).
  *  2. Normalized flat table: one row per (sub-)document, linked by
  *     (id, parent_id, granularity, adjacency) exactly like the reference's own
  *     flatten encoding (reference: traverse.py:197-228). This is the
  *     100 TB-scale representation; deep traversal is an iterative self-join.
  */
object DocSchema {

  /** NamedScore struct (reference: docarray.proto:53-58). */
  val namedScore: StructType = StructType(Seq(
    StructField("value", FloatType),
    StructField("op_name", StringType),
    StructField("description", StringType),
    StructField("ref_id", StringType)))

  /** Shape-carrying tensor: heterogeneous shapes/dtypes per row
    * (reference: docarray.proto:9-48 NdArrayProto dense). */
  val tensor: StructType = StructType(Seq(
    StructField("values", ArrayType(FloatType)),
    StructField("shape", ArrayType(IntegerType)),
    StructField("dtype", StringType)))

  /** Core (non-nested) fields shared by every depth level. */
  private val coreFields: Seq[StructField] = Seq(
    StructField("id", StringType, nullable = false),
    StructField("parent_id", StringType),
    StructField("granularity", IntegerType),
    StructField("adjacency", IntegerType),
    StructField("blob", BinaryType),
    StructField("tensor", tensor),
    StructField("mime_type", StringType),
    StructField("text", StringType),
    StructField("weight", FloatType),
    StructField("uri", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("_metadata", MapType(StringType, StringType)),
    StructField("offset", FloatType),
    StructField("location", ArrayType(FloatType)),
    StructField("embedding", ArrayType(FloatType)),
    StructField("modality", StringType),
    StructField("evaluations", MapType(StringType, namedScore)),
    StructField("scores", MapType(StringType, namedScore)))

  /** Nested schema to `depth` levels of chunks/matches recursion. */
  def nested(depth: Int = 2): StructType =
    if (depth <= 0) StructType(coreFields)
    else {
      val sub = ArrayType(nested(depth - 1))
      StructType(coreFields :+
        StructField("chunks", sub) :+ StructField("matches", sub))
    }

  /** Flat (normalized) schema — no nested arrays; linkage columns only. */
  val flat: StructType = StructType(coreFields)

  /** Per-field default values. The reference treats a field equal to its
    * default as *not set* — relevant for `$exists`
    * (reference: docarray/array/queryset/lookup.py:108-124 and
    * document/data.py:65-90 non-empty comparison). */
  val defaults: Map[String, Any] = Map(
    "parent_id" -> "", "granularity" -> 0, "adjacency" -> 0,
    "mime_type" -> "", "text" -> "", "weight" -> 0.0f, "uri" -> "",
    "offset" -> 0.0f, "modality" -> "")

  /** An empty-document DataFrame of n rows with generated random ids —
    * `DocumentArray.empty(n)` (reference: array/mixins/empty.py:13-20). */
  def empty(spark: SparkSession, n: Long, depth: Int = 2): DataFrame = {
    val cols = nested(depth).fields.map { f =>
      if (f.name == "id")
        // 128-bit random hex like the reference's default id (data.py:41-43)
        concat(
          lpad(hex(abs(xxhash64(col("seq"), lit(1)))), 16, "0"),
          lpad(hex(abs(xxhash64(col("seq"), lit(2)))), 16, "0")
        ).as("id")
      else lit(null).cast(f.dataType).as(f.name)
    }
    spark.range(n).withColumnRenamed("id", "seq").select(cols.toIndexedSeq: _*)
  }

  /** Resolved `content_type` view of the blob/tensor/text oneof — the
    * reference's `content` union discriminator
    * (reference: docarray.proto:67-76 oneof content;
    * document/data.py non-empty resolution). */
  def contentType(df: DataFrame): DataFrame =
    df.withColumn("content_type",
      when(col("blob").isNotNull, "blob")
        .when(col("tensor").isNotNull, "tensor")
        .when(col("text").isNotNull && col("text") =!= "", "text")
        .otherwise(""))

  /** Wrap an arbitrary DataFrame into the canonical doc shape: named columns
    * are mapped onto core fields; everything else lands in `tags` as strings —
    * the reference's unknown-kwargs-to-tags catch
    * (reference: docarray/base.py:44-66). */
  def fromColumns(df: DataFrame, fieldResolver: Map[String, String] = Map.empty): DataFrame = {
    val renamed = fieldResolver.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val known = flat.fieldNames.toSet
    val (core, extra) = renamed.columns.partition(known.contains)
    val tagCol =
      if (extra.isEmpty) lit(null).cast(MapType(StringType, StringType))
      else map(extra.flatMap(c => Seq(lit(c), col(c).cast(StringType))).toIndexedSeq: _*)
    val cols = flat.fields.map { f =>
      if (core.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else if (f.name == "tags") tagCol.as("tags")
      else lit(null).cast(f.dataType).as(f.name)
    }
    renamed.select(cols.toIndexedSeq: _*)
  }
}

/** Typed flat document for Dataset[Doc] ergonomics. */
case class NamedScore(value: Float, op_name: String, description: String, ref_id: String)
case class Tensor(values: Seq[Float], shape: Seq[Int], dtype: String)
case class Doc(
    id: String,
    parent_id: String = "",
    granularity: Int = 0,
    adjacency: Int = 0,
    blob: Array[Byte] = null,
    tensor: Tensor = null,
    mime_type: String = "",
    text: String = "",
    weight: Float = 0.0f,
    uri: String = "",
    tags: Map[String, String] = Map.empty,
    _metadata: Map[String, String] = Map.empty,
    offset: Float = 0.0f,
    location: Seq[Float] = Nil,
    embedding: Seq[Float] = null,
    modality: String = "",
    evaluations: Map[String, NamedScore] = Map.empty,
    scores: Map[String, NamedScore] = Map.empty)
