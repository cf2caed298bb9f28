package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series anomaly detection — the monitoring tier of the reference
  * pipeline (cites `code/plot-cams-data-update.py`'s visual-inspection
  * role, reference README §Features): instead of a human eyeballing a
  * plot per station, flag the points a robust statistical model calls
  * surprising, at any scale.
  *
  * Three detectors, by contamination tolerance:
  *   - [[rollingZScore]] — local level shift vs the trailing window
  *     (mean/std over the N previous points, per key). One keyed window
  *     shuffle; the frame never materializes per-row state.
  *   - [[madOutliers]] — global per-key robust fence (median ± k·MAD).
  *     Immune to the outliers polluting their own threshold, which is
  *     exactly what breaks plain z-scores on dirty sensor feeds.
  *   - [[Climatology.profile]] (sibling) — seasonal expectation.
  *
  * Exactness discipline: trailing-window mean/variance come from
  * DECIMAL sums of the 6-dp-rounded value (operator semantics, the
  * [[Winsorize]] pattern) — the window sums are exact integers in
  * disguise, and both engines then perform the IDENTICAL double
  * divisions, so z-scores are bit-equal cross-engine and 6-dp rounding
  * cannot straddle. MAD builds on exact interpolated percentiles (the
  * `q_a6_percentile`-proven kernel); at corpus scale the documented
  * swap is `approx_percentile`, same join shape (see SCALE.md).
  */
object Anomaly {

  /** Trailing-window z-score per key: for each row, mean/std over the
    * `nPrev` PRECEDING rows (the row itself excluded — today's value
    * must not defend itself), ordered by (`tsCol`, `idCol`) so frames
    * are total-order deterministic. Rows with fewer than `nPrev`
    * predecessors emit null z (warm-up, not evidence).
    *
    * Scale shape: ONE shuffle on the key; sums, counts and both moments
    * share the single window sort. State per frame is O(1) decimal
    * accumulators — Spark's bounded-preceding ROWS frame streams, it
    * never buffers the partition.
    */
  def rollingZScore(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, nPrev: Int = 20,
      zThreshold: Double = 3.0): DataFrame = {
    require(nPrev >= 2, s"need >= 2 trailing rows for a variance, got $nPrev")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-nPrev, -1)
    val vr = round(col(valueCol), 6).cast("decimal(18,6)")
    val s1 = sum(vr).over(w)
    val s2 = sum((vr * vr).cast("decimal(38,12)")).over(w)
    val n = count(vr).over(w)
    df.select(col(keyCol), col(idCol),
        col(valueCol).cast("double").as("v"),
        n.as("n_prev"), s1.cast("double").as("_s1"), s2.cast("double").as("_s2"))
      .select(col(keyCol), col(idCol), col("n_prev"),
        round(col("v"), 6).as("value_r"),
        // The exact-decimal sums left the window above; everything from
        // here is the same double arithmetic in any engine. Divisions
        // live INSIDE the full-window CaseWhen branches: ANSI mode
        // makes an unguarded n=0 division an error, and CaseWhen
        // evaluates only the taken branch.
        when(col("n_prev") === nPrev, round(winMean, 6)).as("win_mean"),
        when(col("n_prev") === nPrev && winVariance > 0,
          round(winZ, 6)).as("z"),
        when(col("n_prev") === nPrev && winVariance > 0,
          abs(winZ) > zThreshold).cast("long").as("is_anomaly"))
  }

  private def winMean = col("_s1") / col("n_prev")
  private def winVariance =
    (col("_s2") - col("_s1") * col("_s1") / col("n_prev")) /
      (col("n_prev") - lit(1))
  private def winZ = (col("v") - winMean) / sqrt(winVariance)

  /** Per-key robust outlier fence: median and MAD (median absolute
    * deviation), fence = median ± k·1.4826·MAD (1.4826 = the
    * consistency constant making MAD estimate sigma under normality).
    * Returns the per-key summary — median, MAD, rows, outliers — the
    * report a monitoring job alerts on.
    *
    * Scale shape: two percentile aggregates over the data (median, then
    * the deviations' median) + one counting pass; the per-key medians
    * travel back via broadcast join, the DATA is never joined
    * key-to-key. Exact `percentile` buffers values per group — the
    * gate-grade spelling; production at open scale swaps
    * `approx_percentile` (mergeable sketch) with the identical shape.
    */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = df.join(broadcast(med), keyCol)
    val mad = withMed
      .groupBy(col(keyCol))
      .agg(expr(s"percentile(abs(cast($valueCol as double) - med), 0.5)")
        .as("mad"))
    val fenced = withMed.join(broadcast(mad), keyCol)
      .withColumn("_is_out",
        abs(v - col("med")) > lit(k) * lit(1.4826) * col("mad"))
    fenced.groupBy(col(keyCol))
      .agg(
        round(first(col("med")), 6).as("med_r"),
        round(first(col("mad")), 6).as("mad_r"),
        count(lit(1)).as("n_rows"),
        sum(when(col("_is_out"), 1L).otherwise(0L)).as("n_outliers"))
  }
}
