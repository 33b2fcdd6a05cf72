package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Typed-column promotion of dynamic `tags` — the reference's backend
  * `columns=[(name, type)]` config that turns selected tag keys into typed,
  * indexable columns (reference: docarray/array/storage/elastic/backend.py:51-58,
  * docarray/array/storage/annlite/backend.py:36-40 TYPE_MAP).
  *
  * On Spark this is the physical-schema move that unlocks predicate pushdown
  * and partition pruning for tag filters: a predicate on `tags['i']` can't
  * reach the parquet reader, one on the promoted `tag_i` column can — and a
  * promoted column can drive `partitionBy`/`bucketBy` layout.
  */
object Promote {

  /** Promote tag keys to typed top-level columns `tag_<key>`. */
  def tags(df: DataFrame, columns: Map[String, DataType],
      tagsCol: String = "tags", prefix: String = "tag_"): DataFrame =
    columns.foldLeft(df) { case (d, (key, dt)) =>
      d.withColumn(s"$prefix$key", col(tagsCol).getItem(key).cast(dt))
    }

  /** Write with co-location layout: partition by low-cardinality columns
    * (pruning) and/or bucket by a join key (shuffle-free equi-joins between
    * tables bucketed the same way). Bucketing requires saveAsTable. */
  def writeLayout(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Int, String)] = None,
      table: Option[String] = None): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    bucketBy match {
      case Some((n, c)) =>
        w = w.bucketBy(n, c).sortBy(c)
        w.option("path", path).saveAsTable(
          table.getOrElse(path.replaceAll("[^A-Za-z0-9_]", "_")))
      case None => w.save(path)
    }
  }
}
