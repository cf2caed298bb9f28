package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series operator the
  * reference never needed (both its sides are pre-aligned to 10-minute
  * boundaries, SURVEY §2.3) but any irregular-ground-vs-gridded-model
  * comparison does.
  *
  * Built by composition (builder preference (a)): no custom physical
  * operator is required because union + keyed window expresses the exact
  * semantics with one shuffle:
  *
  *   1. tag right rows 0, left rows 1; union on (keys, time, tag, payload)
  *   2. window partitionBy(keys) orderBy(time, tag) rowsBetween(-∞, 0):
  *      `last(right_payload, ignoreNulls)` — for every left row this is
  *      precisely the latest right row with right.time <= left.time
  *      (right sorts before left at equal time, so "<=", not "<")
  *   3. keep left rows; optionally null out matches older than `tolerance`
  *
  * Scale shape: ONE shuffle keyed by `keys` (the window), no join node at
  * all, no skew beyond what the key distribution already has. A custom
  * SparkPlan (merge-join style) would save only the tag column overhead —
  * not worth leaving the optimizer's cost model.
  */
object AsOfJoin {

  /** For each left row, attach the most recent right payload at or before
    * the left row's time, per key.
    *
    * @param rightPayload right columns to carry (exposed as `asof.<name>`)
    * @param toleranceSeconds max staleness; matches older than this are
    *                         nulled (None = unbounded)
    */
  def priorJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightPayload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == timeCol).toSeq

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(timeCol),
        lit(0).as("__tag"),
        struct(col(timeCol).as("__rt") +: rightPayload.map(col): _*).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(timeCol),
        lit(1).as("__tag"),
        lit(null).cast(taggedRight.schema("__rv").dataType).as("__rv")) ++
        leftCols.map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("__last_rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val withTolerance = toleranceSeconds match {
      case Some(tol) =>
        matched.withColumn("__last_rv",
          when(col(timeCol).cast("long") - col("__last_rv.__rt").cast("long") <= tol,
            col("__last_rv")).otherwise(lit(null)))
      case None => matched
    }

    withTolerance.select(
      keys.map(col) ++ Seq(col(timeCol)) ++ leftCols.map(col) ++
        Seq(col("__last_rv").dropFields("__rt").as("asof")): _*)
  }
}
