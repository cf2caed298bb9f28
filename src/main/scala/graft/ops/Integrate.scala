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

  /** Per-key TIME-WEIGHTED average over irregular samples: the
    * trapezoid integral divided by the observed span — what "average
    * power" actually means when samples aren't equally spaced (a plain
    * `avg` over-weights whichever periods sample densest; TWA is the
    * gap-robust mean the resample-then-average pipeline approximates).
    *
    * Same single keyed-window scan as [[trapezoid]] (the span's
    * min/max ride the same aggregate — no second pass). Keys with
    * zero span (one sample, or all samples coincident) report null
    * rather than a division blow-up. Output:
    * (key, n_samples, span_seconds, twa).
    */
  def timeWeightedMean(df: DataFrame, key: String, ts: String,
      tieBreak: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    df.select(col(key), col(ts), col(tieBreak),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__us", unix_micros(col(ts)))
      .withColumn("__pv", lag(col("__v"), 1).over(w))
      .withColumn("__pus", lag(col("__us"), 1).over(w))
      .withColumn("__term",
        when(col("__pv").isNotNull,
          ((col("__v") + col("__pv")) / lit(2.0)) *
            ((col("__us") - col("__pus")) / lit(1000000.0))))
      .groupBy(col(key))
      .agg(
        coalesce(sum(col("__term").cast("decimal(28,10)")),
          lit(0).cast("decimal(28,10)")).cast("double").as("__int"),
        count(lit(1)).as("n_samples"),
        min(col("__us")).as("__us0"), max(col("__us")).as("__us1"))
      .select(col(key), col("n_samples"),
        round((col("__us1") - col("__us0")) / lit(1000000.0), 6)
          .as("span_seconds"),
        when(col("__us1") > col("__us0"),
          round(col("__int") /
            ((col("__us1") - col("__us0")) / lit(1000000.0)), 6))
          .as("twa"))
  }
}
