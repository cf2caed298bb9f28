package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted order statistics — the importance-weighted twin of the
  * exact percentile kernel. Training-data pipelines weight rows all
  * the time (DSIR importance, source temperatures, dedup multiplicity
  * after cluster collapse); the MEDIAN OF THE WEIGHTED DISTRIBUTION is
  * the robust location estimate under those weights, and no built-in
  * aggregate provides it.
  *
  * Definition (lower weighted median): the smallest value v with
  * cumWeight(≤ v) ≥ totalWeight / 2. With INTEGER weights the
  * qualifying test is spelled `2·cum ≥ total` — pure long arithmetic,
  * no division, no interpolation, so the result is a VALUE FROM THE
  * DATA and bit-exact in any engine.
  *
  * Scale shape: one keyed window (cumulative weight in value order —
  * the same single sort/shuffle every keyed window op here pays) + the
  * qualifying-row aggregate reusing that partitioning. Weights enter
  * as longs; a 10¹²-row key with 10⁶ weights stays far inside long
  * range (10¹⁸).
  */
object WeightedStats {

  /** Per-key lower weighted median: (key, total_w, w_median). Weights
    * must be non-negative integers (cast to long); zero-weight rows
    * are inert (they qualify no earlier value and cannot BE the
    * median unless a positive-weight row shares their value).
    */
  def weightedMedian(df: DataFrame, keyCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).as("k"), col(valueCol).cast("double").as("v"),
        col(weightCol).cast("long").as("wt"))
      .withColumn("_cum", sum(col("wt")).over(w))
      .withColumn("_tot", sum(col("wt")).over(Window.partitionBy(col("k"))))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col("k").as(keyCol))
      .agg(max(col("_tot")).as("total_w"),
        round(min(col("v")), 6).as("w_median"))
  }

  /** One-step Huber M-estimate of location per key: start from the
    * plain mean, downweight residuals beyond `k` by k/|r|, take ONE
    * reweighted mean — the classic fixed-iteration compromise between
    * the outlier-fragile mean and the fully-robust (but two-pass-sort)
    * weighted median. A single reweight caps every observation's
    * weighted residual at k — enough to cut a gross outlier's pull by
    * a large factor (spec: 208 → 68 on an 80%-clean key), though a
    * badly corrupted start needs the weighted median for full
    * robustness; fixing the iteration count at one is what keeps the
    * estimator a deterministic closed form both engines replay.
    *
    * Two partial-agg shuffles on the key (mean pass, reweight pass) —
    * the second join broadcasts the key-sized mean table back onto the
    * scan. Weights and weighted products round to 9 dp before their
    * decimal sums, so accumulation order is pinned. Output:
    * (key, n, mean_raw, huber_mean).
    */
  def huberMean(df: DataFrame, keyCol: String, valueCol: String,
      k: Double): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val in = df.select(col(keyCol).as("k"),
      round(col(valueCol), 6).cast("decimal(18,6)").as("v"))
    val means = in.groupBy("k")
      .agg(count(lit(1)).as("n"),
        (sum(col("v")).cast("double") / count(lit(1))).as("m0"))
    val reweighted = in.join(broadcast(means), "k")
      .withColumn("_r", abs(col("v").cast("double") - col("m0")))
      .withColumn("_w",
        when(col("_r") <= k, lit(1.0)).otherwise(lit(k) / col("_r")))
      .select(col("k"),
        round(col("_w"), 9).cast("decimal(28,9)").as("_w9"),
        round(col("_w") * col("v").cast("double"), 9).cast("decimal(28,9)")
          .as("_wv9"))
      .groupBy("k")
      .agg(sum("_w9").as("sw"), sum("_wv9").as("swv"))
    means.join(reweighted, "k")
      .select(col("k").as(keyCol), col("n"),
        round(col("m0"), 6).as("mean_raw"),
        round(col("swv").cast("double") / col("sw").cast("double"), 6)
          .as("huber_mean"))
  }
}
