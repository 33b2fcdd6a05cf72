package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal "dataclass" schema lowering — the reference compiles a
  * user-annotated dataclass (Image/Text/Audio/... fields) into a Document
  * whose chunks hold the per-modality sub-documents, with the attribute →
  * chunk-position mapping stored in `_metadata['multi_modal_schema']`
  * (reference: docarray/dataclasses/types.py:35-124 AttributeType taxonomy
  * + setter registry; docarray/document/mixins/multimodal.py:117-156
  * position-map access).
  *
  * Spark shape: the user table keeps one column per modality; `pack` lowers
  * them into a `chunks` array<struct> with `modality` set and a positions
  * map, `attr` is the generated column-path access for one attribute.
  */
object Modalities {

  /** Lower modality columns into chunk sub-docs.
    *
    * @param modalityCols (columnName, modality) — for text-like columns the
    *        value lands in chunk.text; binary columns land in chunk.blob.
    */
  def pack(df: DataFrame, idCol: String,
      modalityCols: Seq[(String, String)]): DataFrame = {
    val chunks = modalityCols.zipWithIndex.map { case ((c, modality), i) =>
      val isBinary = df.schema(c).dataType ==
        org.apache.spark.sql.types.BinaryType
      struct(
        concat(col(idCol).cast("string"), lit(s"-$c")).as("id"),
        col(idCol).cast("string").as("parent_id"),
        lit(1).as("granularity"),
        lit(modality).as("modality"),
        (if (isBinary) col(c) else lit(null).cast("binary")).as("blob"),
        (if (isBinary) lit(null).cast("string") else col(c).cast("string")).as("text"))
    }
    val positions = map(modalityCols.zipWithIndex.flatMap { case ((c, _), i) =>
      Seq(lit(c), lit(i.toString))
    }: _*)
    df.withColumn("chunks", array(chunks: _*))
      .withColumn("_metadata", map(lit("multi_modal_schema"),
        to_json(positions)))
      .drop(modalityCols.map(_._1): _*)
  }

  /** Access one packed attribute's sub-doc (by its compiled position —
    * reference: multimodal.py:117-135). */
  def attr(packed: DataFrame, idCol: String, name: String,
      modalityCols: Seq[(String, String)]): DataFrame = {
    val pos = modalityCols.indexWhere(_._1 == name)
    require(pos >= 0, s"unknown attribute $name")
    packed.select(col(idCol), col("chunks").getItem(pos).as("_c"))
      .select(col(idCol), col("_c.modality").as("modality"),
        col("_c.text").as("text"), col("_c.blob").as("blob"))
  }
}
