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
}
