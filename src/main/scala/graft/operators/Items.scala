package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row/column access, update and delete — the reference's
  * `__getitem__`/`__setitem__`/`__delitem__` surface
  * (reference: docarray/array/mixins/getitem.py:48-108,
  * setitem.py:61-244, delitem.py:19-78) plus sequence ops
  * (reference: array/storage/base/seqlike.py:10-55).
  *
  * The reference keeps an `offset2id` ordering table
  * (array/storage/base/helper.py); the Spark equivalent is an explicit
  * `offset` column — orderings are never implicit in a distributed table.
  */
object Items {

  /** da[ids] / da[id] — selection by id set. */
  def byIds(df: DataFrame, idCol: String, ids: Seq[Any]): DataFrame =
    df.where(col(idCol).isin(ids: _*))

  /** da[bool_mask] — predicate selection (the mask is a Column here). */
  def byMask(df: DataFrame, mask: Column): DataFrame = df.where(mask)

  /** da[start:end] by an explicit offset column. */
  def bySlice(df: DataFrame, offsetCol: String, start: Long, end: Long): DataFrame =
    df.where(col(offsetCol) >= start && col(offsetCol) < end)

  /** da[:, ['a','b']] — bulk attribute selection. */
  def attrs(df: DataFrame, names: String*): DataFrame = df.select(names.map(col): _*)

  /** da[:, 'attr'] = values / apply-by-id: overwrite columns from an
    * `updates` table keyed by id; non-updated rows keep their values
    * (reference setitem.py:61-244; apply writes back by id,
    * parallel.py:100-115). Implemented as a left join + per-column
    * coalesce(new, old) — Delta MERGE shape without Delta. */
  def updateById(df: DataFrame, updates: DataFrame, idCol: String): DataFrame = {
    def uc(c: String) = col(s"_u.`$c`")
    def bc(c: String) = col(s"_b.`$c`")
    val updCols = updates.columns.filterNot(_ == idCol).toSet
    val joined = df.as("_b").join(updates.as("_u"),
      bc(idCol) === uc(idCol), "left")
    val proj = df.columns.map {
      case c if c == idCol => bc(c).as(c)
      case c if updCols(c) => coalesce(uc(c), bc(c)).as(c)
      case c => bc(c).as(c)
    }
    joined.select(proj.toIndexedSeq: _*)
  }

  /** da[[o1, o2, ...]] — multi-offset selection preserving the REQUESTED
    * order (reference getitem.py:66-80 list/ndarray indexing keeps the
    * index order, not the table order). */
  def byOffsetsOrdered(df: DataFrame, offsetCol: String, offsets: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val want = offsets.zipWithIndex.toDF("_want_off", "_want_pos")
    df.join(broadcast(want), col(offsetCol) === col("_want_off"))
      .orderBy("_want_pos")
      .drop("_want_off", "_want_pos")
  }

  /** Upsert: rows in `updates` overwrite same-id rows and new ids are
    * appended — Delta MERGE semantics without Delta (reference: store
    * backends' setitem-or-append, base/getsetdel.py). */
  def upsert(df: DataFrame, updates: DataFrame, idCol: String): DataFrame =
    Reduce.merge(updates, df, idCol)

  /** del da[ids] (reference delitem.py). */
  def deleteByIds(df: DataFrame, idCol: String, ids: Seq[Any]): DataFrame =
    df.where(!col(idCol).isin(ids: _*))

  def deleteWhere(df: DataFrame, cond: Column): DataFrame = df.where(!cond)

  /** append/extend/+ — union with schema alignment (reference
    * seqlike.py:10-55). */
  def extend(df: DataFrame, other: DataFrame): DataFrame =
    df.unionByName(other, allowMissingColumns = true)

  /** `doc.id in da` as a data operation: semi-join membership. */
  def containsIds(df: DataFrame, idCol: String, other: DataFrame,
      otherId: String): DataFrame =
    other.join(df.select(col(idCol).as(otherId)), Seq(otherId), "left_semi")

  /** Assign a stable dense offset column (an explicit replacement for the
    * reference's offset2id). Single narrow window over a total order —
    * use only when a global ordering is genuinely required. */
  def withOffsets(df: DataFrame, orderBy: Column): DataFrame =
    df.withColumn("offset",
      (row_number().over(Window.orderBy(orderBy)) - 1).cast("double"))
}
