package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the nearest right row with the same
  * key at-or-before (backward) / at-or-after (forward) the left time,
  * optionally within a tolerance. Not in the reference's surface, but a
  * staple of time-series/event analytics engines, included for engine
  * completeness.
  *
  * Physical shape: union both sides tagged, one shuffle on (key), one
  * window sort on (key, time) with `last(ignoreNulls)` carrying the
  * nearest right-side values — no range cross product, skew-safe under
  * AQE. DuckDB's native `ASOF JOIN` is the oracle twin (its >= / <=
  * ordering condition maps to backward / forward here).
  */
object AsOf {

  /** @param left      probe side (each row gets matched)
    * @param right     reference side (nearest row per `direction`)
    * @param keys      join key column names (same names on both sides)
    * @param leftTime  event-time column on the left (numeric or timestamp)
    * @param rightTime event-time column on the right (comparable type)
    * @param rightVals right columns carried into the output (null when no
    *                  right row qualifies)
    * @param direction "backward" (latest right.time <= left.time — the
    *                  classic as-of) or "forward" (earliest right.time >=
    *                  left.time)
    * @param tolerance max |left.time − right.time| (same units as the
    *                  time columns, which must then be numeric); matches
    *                  further away are nulled out
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")

    val lp = left.select(
      left.columns.map(col) :+ lit(0).as("_side") :+ col(leftTime).as("_t"): _*)
    val rp = right.select(
      keys.map(col) ++ rightVals.map(c => col(c).as(s"_r_$c")) :+
        col(rightTime).as("_r_asofmt") :+
        lit(1).as("_side") :+ col(rightTime).as("_t"): _*)
    val unioned = lp.unionByName(rp, allowMissingColumns = true)

    // right rows (_side=1) sort before left rows (_side=0) at equal time
    // in BOTH traversal directions, so exact ties are included (ASOF
    // >= / <= semantics)
    val ord = if (direction == "backward") col("_t").asc else col("_t").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carrySrc = rightVals.map(c => s"_r_$c" -> s"_asof_$c") :+
      ("_r_asofmt" -> "_asofmt")
    val carried = carrySrc.foldLeft(unioned) { case (d, (src, dst)) =>
      d.withColumn(dst, last(col(src), ignoreNulls = true).over(w))
    }

    // tolerance is evaluated against the nearest right ROW's time; value
    // columns are carried independently (a null right value falls back to
    // an earlier/later row's value — keep right values non-null if strict
    // row semantics matter)
    val within = tolerance match {
      case Some(tol) =>
        val diff = if (direction == "backward") col("_t") - col("_asofmt")
        else col("_asofmt") - col("_t")
        col("_asofmt").isNotNull && diff <= tol
      case None => lit(true)
    }
    val outCols = left.columns.map(col) ++ rightVals.map(c =>
      when(within, col(s"_asof_$c")).as(c))
    carried.where(col("_side") === 0).select(outCols: _*)
  }
}
