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
    */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
      loQ: Double, hiQ: Double): DataFrame = {
    require(keys.nonEmpty, "winsorize needs at least one key column")
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ,
      s"quantiles must satisfy 0 <= lo < hi <= 1, got [$loQ, $hiQ]")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(
        round(expr(s"percentile($valueCol, $loQ)"), 6).as("lo_bound"),
        round(expr(s"percentile($valueCol, $hiQ)"), 6).as("hi_bound"))
    df.join(broadcast(bounds), keys)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("lo_bound")), col("hi_bound")))
  }
}
