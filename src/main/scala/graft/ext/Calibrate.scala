package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-source score calibration by quantile mapping — the step that
  * makes quality scores COMPARABLE across corpus sources before a
  * single global threshold is applied (extension; the reference
  * compares two instruments' distributions via scatter/linregress,
  * `code/solrad-compare.py:60-96` — this is the corpus-scale analogue
  * where the "instruments" are data sources with incompatible score
  * scales).
  *
  * Two pieces:
  *   - [[quantileTable]]: per-source quantiles at a fixed probe grid
  *     side-by-side with the POOLED quantiles at the same grid — the
  *     calibration table (one row per source x grid point).
  *   - [[applyQuantileMap]]: piecewise-linear per-row transform through
  *     that table (monotone, endpoint-clamped) — source-local score in,
  *     pooled-scale score out.
  *
  * Scale shape: the table is ONE exact-percentile aggregate per side
  * (per-source output = |sources| x |grid| rows; pooled = |grid| rows),
  * joined on the grid index with the pooled side broadcast. The
  * application is a broadcast join of the per-source map arrays onto
  * the scan plus a higher-order-function interpolation — the data
  * itself never shuffles. At corpus scale swap `percentile` for
  * `approx_percentile` (mergeable t-digest) in the table pass and keep
  * both joins unchanged.
  *
  * Determinism contract: grid values and both quantile columns are
  * rounded to 6 dp as part of the operator's semantics (exact
  * interpolated percentiles differ in final ulps across engines, and
  * an ulp must not move the published calibration table).
  */
object Calibrate {

  /** Per-source vs pooled quantiles at `grid` (probabilities in (0,1)).
    * Output: (source, q, src_val, ref_val, delta) where delta =
    * ref_val - src_val is the additive correction at that quantile.
    */
  def quantileTable(
      df: DataFrame, sourceCol: String, valueCol: String,
      grid: Seq[Double]): DataFrame = {
    require(grid.nonEmpty, "calibration grid must be non-empty")
    require(grid.forall(q => q > 0 && q < 1),
      s"grid probabilities must lie strictly inside (0,1): $grid")
    require(grid == grid.sorted && grid.distinct == grid,
      s"grid must be strictly increasing: $grid")
    val arr = grid.mkString("array(", ", ", ")")
    val qLit = typedlit(grid.map(q => math.rint(q * 1e6) / 1e6).toArray)
    val per = df
      .groupBy(col(sourceCol).as("source"))
      .agg(expr(s"percentile($valueCol, $arr)").as("__qs"))
      .select(col("source"), posexplode(col("__qs")).as(Seq("__i", "__sv")))
    val pooled = df
      .agg(expr(s"percentile($valueCol, $arr)").as("__qs"))
      .select(posexplode(col("__qs")).as(Seq("__i", "__rv")))
    per.join(broadcast(pooled), "__i")
      .select(
        col("source"),
        element_at(qLit, col("__i") + 1).as("q"),
        round(col("__sv"), 6).as("src_val"),
        round(col("__rv"), 6).as("ref_val"))
      .withColumn("delta", round(col("ref_val") - col("src_val"), 6))
  }

  /** Map each row's `valueCol` onto the pooled scale through its
    * source's calibration table (from [[quantileTable]]): linear
    * interpolation between the bracketing grid points, clamped to the
    * endpoint `ref_val`s outside the grid range. Rows whose source has
    * no table entry pass through unchanged (null-safe coalesce) — new
    * sources appear between calibration refreshes.
    *
    * Adds `<valueCol>_cal` (rounded to 6 dp). The table side collapses
    * to one array row per source and broadcasts; interpolation is a
    * higher-order-function expression — zero shuffles on the data.
    */
  def applyQuantileMap(
      df: DataFrame, table: DataFrame, sourceCol: String,
      valueCol: String): DataFrame = {
    val maps = table.groupBy(col("source").as(sourceCol))
      .agg(sort_array(collect_list(struct(
        col("src_val"), col("ref_val")))).as("__map"))
    val v = col(valueCol).cast("double")
    // try_element_at: outside the grid range one of the filtered arrays
    // is EMPTY, and ANSI element_at throws instead of returning null.
    val lower = expr(s"try_element_at(filter(__map, p -> p.src_val <= cast($valueCol as double)), -1)")
    val upper = expr(s"try_element_at(filter(__map, p -> p.src_val > cast($valueCol as double)), 1)")
    val interp = when(col("__map").isNull, v)
      .when(lower.isNull, upper.getField("ref_val"))
      .when(upper.isNull, lower.getField("ref_val"))
      .otherwise(
        lower.getField("ref_val") +
          (v - lower.getField("src_val")) *
          (upper.getField("ref_val") - lower.getField("ref_val")) /
          (upper.getField("src_val") - lower.getField("src_val")))
    df.join(broadcast(maps), Seq(sourceCol), "left")
      .withColumn(s"${valueCol}_cal", round(interp, 6))
      .drop("__map")
  }

  /** Isotonic (monotone non-decreasing) calibration of a score against
    * a boolean outcome, on fixed-width score bins — pool-adjacent-
    * violators without any sequential pass, via the minimax identity
    * (Robertson/Wright/Dykstra, "Order Restricted Statistical
    * Inference", Thm 1.4.4):
    *
    *   iso(i) = max_{j ≤ i} min_{k ≥ i} mean(pos over bins j..k)
    *
    * [[quantileTable]] aligns score SCALES across sources; this is the
    * PROBABILITY-calibration step (Platt/isotonic family) that turns a
    * monotone-but-miscalibrated score into an outcome rate — the fix
    * [[Reliability]]'s curve decides to apply.
    *
    * Scale shape: the data contributes ONE `bins`-row partial-agg
    * shuffle (the Reliability binning); the minimax runs on broadcast
    * triangular self-joins of that `bins`-row table — O(bins³) pairs
    * of INTEGER sums, never a driver-side loop, never a window over
    * data. Determinism: every range mean is one IEEE division of
    * exact long sums; min/max over identical operand sets pick
    * identical values on both engines; rounding happens once at the
    * output.
    *
    * Output per non-empty bin: (bin, n, pos, raw_rate, iso_rate),
    * with iso_rate monotone non-decreasing in bin.
    */
  def isotonicBinned(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]: $bins")
    val perBin = df
      .select(
        least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("long")
          .as("bin"),
        when(col(labelCol), 1L).otherwise(0L).as("_pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("_pos").as("pos"))
    val members = perBin.select(col("bin").as("m"), col("n").as("nm"),
      col("pos").as("pm"))
    val ranges = perBin.select(col("bin").as("j"))
      .join(broadcast(perBin.select(col("bin").as("k"))),
        col("j") <= col("k"))
      .join(broadcast(members), col("m") >= col("j") && col("m") <= col("k"))
      .groupBy("j", "k")
      .agg((sum("pm").cast("double") / sum("nm")).as("mean"))
    val fitted = perBin.select(col("bin").as("i"))
      .join(broadcast(ranges), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min("mean").as("m1"))
      .groupBy("i").agg(max("m1").as("fit"))
    perBin.join(broadcast(fitted), col("bin") === col("i"))
      .select(col("bin"), col("n"), col("pos"),
        round(col("pos").cast("double") / col("n"), 6).as("raw_rate"),
        round(col("fit"), 6).as("iso_rate"))
  }
}
