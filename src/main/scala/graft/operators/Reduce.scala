package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `da.reduce(other)`: full-outer merge by id with left-priority field-wise
  * coalesce (reference: docarray/array/mixins/reduce.py:7-91 — union of both
  * arrays, fields of the left doc win when both are set; nested
  * chunks/matches are themselves reduced recursively).
  *
  * Spark shape: `full_outer` join on the id column + `coalesce(left, right)`
  * per field — one shuffle on the id key, broadcastable when one side is
  * small. Nested array<struct> columns are merged wholesale with left
  * priority (bounded-depth recursion would union + re-group children; the
  * normalized flat representation handles deep nesting by running this
  * per granularity level).
  */
object Reduce {

  def merge(left: DataFrame, right: DataFrame, idCol: String = "id"): DataFrame = {
    // qualified-by-alias refs so self-derived left/right stay unambiguous
    def lc(c: String) = col(s"_l.`$c`")
    def rc(c: String) = col(s"_r.`$c`")
    val joined = left.as("_l").join(right.as("_r"),
      lc(idCol) === rc(idCol), "full_outer")
    val lCols = left.columns.toSet
    val rCols = right.columns.toSet
    val outCols = (left.columns ++ right.columns.filterNot(lCols)).toSeq
    val proj = outCols.map {
      case c if c == idCol => coalesce(lc(idCol), rc(idCol)).as(idCol)
      case c if lCols(c) && rCols(c) => coalesce(lc(c), rc(c)).as(c)
      case c if lCols(c) => lc(c).as(c)
      case c => rc(c).as(c)
    }
    joined.select(proj: _*)
  }

  /** reduce_all: left-fold merge of many arrays (reference: reduce.py:66-91). */
  def mergeAll(dfs: Seq[DataFrame], idCol: String = "id"): DataFrame =
    dfs.reduceLeft(merge(_, _, idCol))
}
