package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `da.summary()` — schema + per-field fill/stat report
  * (reference: docarray/array/mixins/plot.py:22-123 prints attribute
  * coverage and type breakdown). One distributed pass: every column's
  * null/fill count and basic stats in a single aggregate. */
object Summary {

  /** One row per column: name, type, non-null count, fill ratio, plus
    * min/max for numerics and avg length for strings/arrays. */
  def describe(df: DataFrame): DataFrame = {
    val total = df.count()
    val spark = df.sparkSession
    import spark.implicits._

    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(count(c).as(s"${f.name}__n"))
      f.dataType match {
        case _: NumericType => base ++ Seq(
          min(c).cast("double").as(s"${f.name}__min"),
          max(c).cast("double").as(s"${f.name}__max"))
        case StringType => base :+
          avg(length(c)).as(s"${f.name}__avglen")
        case _: ArrayType => base :+
          avg(size(c)).as(s"${f.name}__avglen")
        case _ => base
      }
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    def get(n: String): Option[Double] =
      if (row.schema.fieldNames.contains(n) && !row.isNullAt(row.fieldIndex(n)))
        Some(row.getAs[Any](n).toString.toDouble)
      else None

    df.schema.fields.map { f =>
      val n = get(s"${f.name}__n").getOrElse(0.0).toLong
      (f.name, f.dataType.simpleString, n,
        if (total == 0) 0.0 else n.toDouble / total,
        get(s"${f.name}__min"), get(s"${f.name}__max"),
        get(s"${f.name}__avglen"))
    }.toSeq.toDF("column", "type", "non_null", "fill_ratio", "min", "max", "avg_len")
  }
}
