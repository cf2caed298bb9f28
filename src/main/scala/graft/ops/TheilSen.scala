package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend estimation — the median of all pairwise
  * slopes (Theil 1950; Sen 1968). The reference fits OLS per station
  * ([[LinReg]], `code/plot-cams-data-update.py` linregress); Theil–Sen
  * is its contamination-robust sibling: up to ~29% of the points can
  * be arbitrarily corrupt (sensor faults, stuck loggers) without
  * moving the slope, which is exactly the long-term-degradation
  * question on dirty field data.
  *
  * Scale shape: all-pairs is O(n²) per key, so the estimator runs on a
  * BOUNDED deterministic sample — per key, the `maxPoints` rows with
  * the smallest md5(id) (the house hash-order; engine-portable and
  * stable under corpus growth). The `row_number <= k` spelling lowers
  * to TopKPerKey bounded heaps (no per-key sort), the pair join is a
  * self-join of k-row groups co-keyed on one shuffle, and pair count
  * is capped at C(k, 2) per key regardless of data size. Statistical
  * cost of sampling: the Theil–Sen estimator on a uniform subsample is
  * itself the standard scalable spelling (the exact all-pairs form is
  * quadratic for ANY engine).
  *
  * Exactness: slopes are double divisions of identical operands in
  * both engines; the median is the exact interpolated percentile (the
  * `q_a6_percentile`-proven kernel).
  */
object TheilSen {

  /** Per-key robust slope: (key, n_points, n_pairs, slope_med).
    * Pairs require strictly increasing x (equal-x pairs carry no slope
    * information and are excluded in both engines).
    */
  def slope(df: DataFrame, keyCol: String, idCol: String, xCol: String,
      yCol: String, maxPoints: Int = 60): DataFrame = {
    require(maxPoints >= 2, s"need >= 2 sample points, got $maxPoints")
    val w = Window.partitionBy(col("k"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    val sample = df
      .select(col(keyCol).as("k"), col(idCol).as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxPoints)
      .drop("_rn")
    val a = sample.select(col("k"), col("x").as("xa"), col("y").as("ya"))
    val b = sample.select(col("k").as("kb"), col("x").as("xb"), col("y").as("yb"))
    val pairs = a.join(b, col("k") === col("kb") && col("xa") < col("xb"))
      .select(col("k"), ((col("yb") - col("ya")) / (col("xb") - col("xa")))
        .as("slope"))
    val slopes = pairs.groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        // + 0.0 normalizes IEEE signed zero (a flat series' pairwise
        // slopes can interpolate to -0.0 in one engine and 0.0 in the
        // other; hash compares render the sign, value compares don't)
        (round(expr("percentile(slope, 0.5)"), 6) + lit(0.0)).as("slope_med"))
    val counts = sample.groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_points"))
    counts.join(slopes, Seq(keyCol), "left")
      .select(col(keyCol), col("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("slope_med"))
  }
}
