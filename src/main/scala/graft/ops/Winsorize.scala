package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percentile winsorization (outlier clipping) per key — the standard
  * robust-stats cleaning step before aggregates that a broken sensor
  * or a log-scraper glitch would otherwise poison.
  *
  * Scale shape: the per-key clip bounds are ONE exact-percentile
  * aggregate over the data (small output: one row per key), broadcast
  * back onto the scan — the data itself shuffles zero times for the
  * clipping; whatever aggregate follows pays its own (first) shuffle.
  * At corpus scale swap `percentile` for `approx_percentile`
  * (mergeable t-digest) in the bounds pass and keep the same join.
  *
  * Determinism contract: bounds are rounded to 6 dp as part of the
  * OPERATOR's semantics (not just the gate's) — exact interpolated
  * percentiles differ in final ulps across engines, and an ulp on the
  * bound must not flip a clip decision.
  */
object Winsorize {

  /** Add `<valueCol>_w` (clipped value) plus the per-key bounds
    * `lo_bound` / `hi_bound` to every row.
    *
    * `exact = false` is the 100 TB path: `approx_percentile`'s sketch
    * is MERGEABLE, so the bounds pass stays one partial-aggregate
    * shuffle of sketch buffers (no per-key value lists); bounds then
    * land on an actual data element within `1/accuracy` relative rank
    * of the target quantile instead of the interpolated exact value.
    * The join shape — tiny bounds table broadcast back onto the scan,
    * zero data shuffles — is identical in both modes, so gates pin the
    * exact mode and scale runs flip the flag without replanning.
    */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
      loQ: Double, hiQ: Double, exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(keys.nonEmpty, "winsorize needs at least one key column")
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ,
      s"quantiles must satisfy 0 <= lo < hi <= 1, got [$loQ, $hiQ]")
    def pct(q: Double) =
      if (exact) s"percentile($valueCol, $q)"
      else s"approx_percentile($valueCol, $q, $accuracy)"
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(
        round(expr(pct(loQ)), 6).as("lo_bound"),
        round(expr(pct(hiQ)), 6).as("hi_bound"))
    df.join(broadcast(bounds), keys)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("lo_bound")), col("hi_bound")))
  }

  /** Robust outlier profile per key: median / MAD (median absolute
    * deviation) and the count of rows deviating more than `k` MADs from
    * the median — the robust-z-score screen that survives exactly the
    * heavy-tailed contamination that mean/stddev screens are broken by
    * (one wild sensor value moves a mean arbitrarily far; it moves a
    * median by at most one order statistic).
    *
    * Scale shape: two exact-percentile aggregates per key (median, then
    * median of |x - med| after a broadcast join of the tiny per-key
    * median table) plus one counting aggregate — the data shuffles
    * once per aggregate on the key only, and the intermediate tables
    * are |keys| rows. At corpus scale swap `percentile` for
    * `approx_percentile` in both median passes; the join shape holds.
    *
    * Determinism contract: median and MAD are rounded to 6 dp before
    * the `k * mad` threshold comparison, so an engine ulp cannot flip
    * an outlier decision (same contract as [[winsorize]]'s bounds).
    */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Double): DataFrame = {
    require(keys.nonEmpty, "madOutliers needs at least one key column")
    require(k > 0, s"MAD multiplier must be positive, got $k")
    val meds = df.groupBy(keys.map(col): _*)
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    val dev = df.join(broadcast(meds), keys)
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mads = dev.groupBy(keys.map(col): _*)
      .agg(round(expr("percentile(__dev, 0.5)"), 6).as("mad"))
    dev.join(broadcast(mads), keys)
      .groupBy((keys.map(col) ++ Seq(col("med"), col("mad"))): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_rate",
        round(col("n_outliers").cast("double") / col("n"), 6))
  }
}
