package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trapezoidal integration of irregular time series — the physical
  * quantity behind the reference's irradiance plots: power samples
  * (W/m²) integrate to energy (Wh/m²), and real station feeds are
  * never on a perfect grid, so the rectangle-sum a resample implies
  * under-reads around gaps. (Reference analogue: the daily/monthly
  * energy aggregation implied by `code/plot-cams-solrad.py`'s daily
  * means; this is the gap-robust form.)
  *
  * Scale shape: one keyed lag window (same budget as any rolling op),
  * then a per-key aggregate that reuses the window's hash
  * partitioning — the window's exchange is the plan's only shuffle.
  * Each trapezoid term is computed in double (deterministic IEEE ops
  * on both engines), then cast to decimal BEFORE summing, so the
  * cross-partition sum order can never change the answer.
  */
object Integrate {

  /** Per-key trapezoid integral: Σ (v + v_prev)/2 · Δt_seconds.
    * `(key, integral, n_intervals)`; singleton keys integrate to 0
    * over 0 intervals. Time deltas ride integer microseconds.
    */
  def trapezoid(df: DataFrame, key: String, ts: String, tieBreak: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    df.select(col(key), col(ts), col(tieBreak), col(valueCol).cast("double").as("__v"))
      .withColumn("__pv", lag(col("__v"), 1).over(w))
      .withColumn("__pus", lag(unix_micros(col(ts)), 1).over(w))
      .withColumn("__term",
        when(col("__pv").isNotNull,
          ((col("__v") + col("__pv")) / lit(2.0)) *
            ((unix_micros(col(ts)) - col("__pus")) / lit(1000000.0))))
      .groupBy(col(key))
      .agg(
        coalesce(sum(col("__term").cast("decimal(28,10)")),
          lit(0).cast("decimal(28,10)")).cast("double").as("integral"),
        count(col("__term")).as("n_intervals"))
  }
}
