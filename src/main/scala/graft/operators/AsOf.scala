package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with the same
  * key and right.time <= left.time. Not in the reference's surface, but a
  * staple of time-series/event analytics engines, included for engine
  * completeness.
  *
  * Physical shape: union both sides tagged, one shuffle on (key), one
  * window sort on (key, time) with `last(ignoreNulls)` carrying the latest
  * right-side values forward — no range cross product, skew-safe under
  * AQE. DuckDB's native `ASOF JOIN` is the oracle twin.
  */
object AsOf {

  /** @param left      probe side (each row gets matched)
    * @param right     reference side (latest row at-or-before left.time)
    * @param keys      join key column names (same names on both sides)
    * @param leftTime  event-time column on the left (numeric or timestamp)
    * @param rightTime event-time column on the right (comparable type)
    * @param rightVals right columns carried into the output (null when no
    *                  right row precedes the left row)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {

    val lp = left.select(
      left.columns.map(col) :+ lit(0).as("_side") :+ col(leftTime).as("_t"): _*)
    val rp = right.select(
      keys.map(col) ++ rightVals.map(c => col(c).as(s"_r_$c")) :+
        lit(1).as("_side") :+ col(rightTime).as("_t"): _*)
    val unioned = lp.unionByName(rp, allowMissingColumns = true)

    // right rows (_side=1) sort before left rows (_side=0) at equal time so
    // "at-or-before" includes exact ties (ASOF >= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightVals.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"_asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }

    val outCols = left.columns.map(col) ++
      rightVals.map(c => col(s"_asof_$c").as(c))
    carried.where(col("_side") === 0).select(outCols: _*)
  }
}
