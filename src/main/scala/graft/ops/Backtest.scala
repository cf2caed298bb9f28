package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Forecast backtesting over resampled series: the seasonal-naive
  * baseline (ŷ(t) = y(t − season)) every real forecaster must beat,
  * scored with MAE and sMAPE per key.
  *
  * The join on shifted bucket keys is gap-correct (a missing history
  * bucket drops the pair instead of shifting it), the error sums go
  * through 6-dp rounds + decimal so both engines agree exactly, and
  * everything after the hourly resample is series-sized.
  */
object Backtest {

  /** Input: raw events (keyCol, tsCol, valueCol). Output per key:
    * (key, n, mae, smape) over all hourly buckets that have a
    * season-back counterpart. `seasonSeconds` must be a multiple of
    * 3600 (hourly buckets).
    */
  def seasonalNaive(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, seasonSeconds: Long): DataFrame = {
    require(seasonSeconds % 3600 == 0, "season must be whole hours")
    val s = SeriesOps.hourlySeries(df, keyCol, tsCol, valueCol)
    val hist = s.select(col("k"), (col("h") + seasonSeconds).as("h"),
      col("m").as("f"))
    val paired = s.join(hist, Seq("k", "h"))
      .withColumn("ae", round(abs(col("m") - col("f")), 6))
      // guarded symmetric error: 0 when both sides are 0
      .withColumn("sm",
        when(abs(col("m")) + abs(col("f")) > 0,
          round(lit(2.0) * abs(col("m") - col("f")) /
            (abs(col("m")) + abs(col("f"))), 6)).otherwise(lit(0.0)))
    paired.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("ae").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mae"),
        round(sum(col("sm").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("smape"))
  }
}
