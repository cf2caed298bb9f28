package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diurnal climatology — the seasonal-expectation model of the solar
  * domain (reference README §Features: the daily irradiance cycle is
  * the signal; the deviation from it is the anomaly). A per-(station,
  * hour-of-day) mean profile is the standard baseline for clear-sky
  * index–style ratios and for de-seasonalizing before trend tests.
  *
  * Scale shape: the profile is ONE partially-aggregated shuffle of
  * (key, hour) groups — 24·|keys| rows, broadcastable by construction.
  * Application joins that broadcast profile back onto the scan: the
  * DATA never shuffles to be scored.
  *
  * Exactness: means come from DECIMAL sums of the 6-dp-rounded value
  * (operator semantics, the [[Winsorize]]/[[Anomaly]] pattern); both
  * engines then perform the identical long-ratio double division, so
  * anomalies are bit-equal cross-engine.
  */
object Climatology {

  private def vr(valueCol: String) =
    round(col(valueCol), 6).cast("decimal(18,6)")

  /** Mean profile per (key, UTC hour-of-day): (key, hour, n, clim_mean). */
  def profile(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(keyCol), hour(col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"), sum(vr(valueCol)).as("_s"))
      .select(col(keyCol), col("hour"), col("n"),
        round(col("_s").cast("double") / col("n"), 6).as("clim_mean"))

  /** Score rows against the profile: anomaly = value − expectation and
    * the guarded seasonal ratio (the clear-sky-index analogue; null
    * where the expectation is 0 — a 0-baseline hour has no ratio).
    */
  def anomaly(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val prof = profile(df, keyCol, tsCol, valueCol)
    df.select(col(keyCol), col(idCol), hour(col(tsCol)).as("hour"),
        round(col(valueCol), 6).as("value_r"))
      .join(broadcast(prof), Seq(keyCol, "hour"))
      .select(col(keyCol), col(idCol), col("hour"), col("value_r"),
        col("clim_mean"),
        round(col("value_r") - col("clim_mean"), 6).as("anomaly"),
        when(col("clim_mean") =!= 0.0,
          round(col("value_r") / col("clim_mean"), 6)).as("seasonal_ratio"))
  }
}
