package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model calibration monitoring — the reliability curve (score deciles
  * vs realized outcome rate) for any learned scorer in the pipeline
  * ([[QualityModel]]'s filter, a reward model, a dedup verifier).
  * [[Drift]] watches the model's INPUTS move; this watches its
  * OUTPUTS stay honest: a well-calibrated bin's positive rate tracks
  * its mean score, and a bin where they diverge is where the threshold
  * is silently mis-filtering — the retrain/recalibrate trigger
  * ([[Calibrate]] is the fix this table decides to apply).
  *
  * Scale shape: one fixed-width binning expression (no percentile
  * pass, no window) + ONE partial-agg shuffle of `bins` groups.
  * Exactness: mean scores come from DECIMAL sums of the 6-dp-rounded
  * score; rates are integer-count double divisions — both engines run
  * the identical algebra.
  */
object Reliability {

  /** Per-bin calibration table: (bin, n, mean_score, pos_rate) over
    * fixed-width score bins (scores are expected in [0, 1]; the top
    * edge folds into the last bin).
    */
  def curve(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    df.select(
        least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("long").as("bin"),
        round(col(scoreCol), 6).cast("decimal(18,6)").as("_s"),
        when(col(labelCol), 1L).otherwise(0L).as("_pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_s")).as("_ss"),
        sum(col("_pos")).as("_np"))
      .select(col("bin"), col("n"),
        round(col("_ss").cast("double") / col("n"), 6).as("mean_score"),
        round(col("_np").cast("double") / col("n"), 6).as("pos_rate"))
  }

  /** Expected Calibration Error — [[curve]]'s table folded to the one
    * number papers report: ECE = Σ_b (n_b/N)·|pos_rate_b − conf_b|,
    * weighted by bin mass. One row: (n, n_bins, ece). Same plan as the
    * curve plus a one-row fold; per-bin terms round to 9 dp before the
    * decimal sum so the scalar is engine-exact.
    */
  def ece(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    val c = curve(df, scoreCol, labelCol, bins)
    val totals = c.agg(sum("n").as("t"))
    c.crossJoin(broadcast(totals))
      .select(col("n"), col("t"),
        round(col("n").cast("double") / col("t") *
          abs(col("pos_rate") - col("mean_score")), 9)
          .cast("decimal(28,9)").as("term"))
      .agg(max(col("t")).cast("long").as("n"),
        count(lit(1)).as("n_bins"),
        round(sum("term").cast("double"), 6).as("ece"))
  }
}
