package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Tumbling resample (SURVEY.md §2.4 A1) and grid densification (§2.9 R1).
  *
  * Reference: pandas `resample('10min').mean()` at
  * `/root/reference/code/get-cams-solrad-ts.py:93-94` — left-closed,
  * left-labeled bins over all numeric columns, mean skipping NaN.
  *
  * Spark mapping: `groupBy(window(ts, width))` + `avg` per numeric column.
  * `window()` buckets are epoch-aligned and left-closed/left-labeled,
  * matching pandas' defaults; `avg` skips nulls, matching `mean()`.
  * One shuffle keyed by (window, extra keys) with map-side partial
  * aggregation — scales linearly with input at any SF.
  *
  * pandas also emits *empty* bins as NaN rows over the full min→max span;
  * that is [[densify]] — kept separate because most consumers (the inner
  * time-join in the compare pipeline) discard empty bins anyway.
  */
object Resample {

  /** Numeric-typed columns of `df` (dynamic projection, SURVEY §2.2 P2 —
    * reference `get-cams-solrad-ts.py:93`). Plan-time schema inspection.
    */
  def numericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSeq

  /** Tumbling mean of `valueCols` (default: all numeric columns except
    * keys) bucketed on `timeCol` every `minutes`, optionally keyed by
    * `extraKeys` (e.g. station). Output: `time` = bucket start timestamp,
    * extra keys, one mean per value column (same name), plus `n_rows`.
    */
  def tumblingMean(
      df: DataFrame,
      timeCol: String,
      minutes: Int,
      valueCols: Seq[String] = Nil,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val vals =
      if (valueCols.nonEmpty) valueCols
      else numericColumns(df).filterNot(c => c == timeCol || extraKeys.contains(c))
    val keyCols = window(col(timeCol), s"$minutes minutes").as("w") +: extraKeys.map(col)
    val aggs = vals.map(c => avg(col(c)).as(c)) :+ count(lit(1)).as("n_rows")
    df.groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("time") +: (extraKeys ++ vals :+ "n_rows").map(col): _*)
  }

  /** R1: densify a bucketed series to the full cartesian grid
    * (keys × every `stepSeconds` bucket between global min and max),
    * left-joining the data so empty buckets surface as null rows —
    * pandas/xarray densification semantics (`compile-solrad.py:138`)
    * without ever materializing the grid on the driver.
    *
    * `bucketed` must carry `bucketCol` as epoch-seconds long. The grid is
    * built with `sequence()` + `explode` (distributed), and the join on
    * (keys, bucket) is a shuffle join; at scale the grid side is tiny
    * relative to data and AQE will pick the right strategy.
    */
  def densify(
      bucketed: DataFrame,
      bucketCol: String,
      stepSeconds: Long,
      keys: Seq[String] = Nil): DataFrame = {
    val spark = bucketed.sparkSession
    val mm = bucketed.agg(min(col(bucketCol)).as("mn"), max(col(bucketCol)).as("mx"))
    val grid = mm.select(explode(sequence(col("mn"), col("mx"), lit(stepSeconds))).as(bucketCol))
    val keyed =
      if (keys.isEmpty) grid
      else grid.crossJoin(broadcast(bucketed.select(keys.map(col): _*).distinct()))
    keyed.join(bucketed, bucketCol +: keys, "left")
  }

  /** Linear interpolation of null values in a densified series — the
    * pandas `interpolate(method='linear')` semantics over the dense
    * grid [[densify]] produces: each null between two observations is
    * filled proportionally to its time distance; leading/trailing gaps
    * (no neighbor on one side) stay null.
    *
    * Two windows over ONE (keys, time) partitioning — running
    * `last(ignoreNulls)` backward-fill state and its mirror
    * `first(ignoreNulls)` forward — so Catalyst plans a single
    * sort/shuffle reused by all four window functions. Shuffle bytes =
    * the series itself; no driver work, no UDF.
    */
  def interpolateLinear(
      dense: DataFrame,
      bucketCol: String,
      valueCol: String,
      keys: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = if (keys.isEmpty) Window.partitionBy() else Window.partitionBy(keys.map(col): _*)
    val back = base.orderBy(col(bucketCol)).rowsBetween(Window.unboundedPreceding, 0)
    val fwd = base.orderBy(col(bucketCol)).rowsBetween(0, Window.unboundedFollowing)
    val v = col(valueCol)
    val t = col(bucketCol)
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(back)
    val nextV = first(v, ignoreNulls = true).over(fwd)
    val nextT = first(when(v.isNotNull, t), ignoreNulls = true).over(fwd)
    dense.withColumn(valueCol,
      when(v.isNotNull, v)
        .otherwise(
          prevV + (nextV - prevV) * (t - prevT) / (nextT - prevT)))
  }

  /** Convenience: mean resample keyed to epoch-seconds bucket starts
    * (oracle-stable long instead of timestamp).
    */
  def tumblingMeanEpoch(
      df: DataFrame,
      timeCol: String,
      minutes: Int,
      valueCols: Seq[String],
      extraKeys: Seq[String] = Nil): DataFrame = {
    val width = minutes * 60L
    val bucket = TimeOps.bucketStartEpoch(col(timeCol), width).as("bucket_start")
    val aggs = valueCols.map(c => avg(col(c)).as(c)) :+ count(col(valueCols.head)).as("n_rows")
    df.groupBy(bucket +: extraKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
