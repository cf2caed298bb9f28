package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic-forecast evaluation: pinball (quantile) loss and
  * split-conformal interval calibration — how a solar-radiation (or
  * load, or traffic) quantile forecast is actually scored and
  * recalibrated in production.
  *
  * Forecasts here come from the engine's own history aggregates
  * (climatology quantiles / seasonal-naive + residual quantiles), so
  * the whole loop — train window, score window, loss — is one
  * deterministic dataflow: history aggregates broadcast onto the
  * evaluation scan, errors rounded then decimal-summed.
  */
object ForecastEval {

  private def d6(c: Column): Column = round(c, 6)

  /** Per-key interpolated quantile table computed from EXPLICIT order
    * statistics: pos = q/100·(n−1), f = y⌊pos⌋ + frac·(y⌊pos⌋₊₁ −
    * y⌊pos⌋). Built-in exact percentiles interpolate with
    * engine-specific expression trees — when the fraction lands on .5
    * (common: group sizes are often multiples of 1/q) the result sits
    * EXACTLY on a 6-dp rounding boundary and the engines' last-ulp
    * difference flips the rounded digit. Spelling the arithmetic
    * ourselves, identically in the oracle, removes the hazard.
    * Output: (keys..., q_pct, n, f). One keyed window sort.
    */
  def quantileTable(df: DataFrame, keys: Seq[String], valueCol: String,
      qsPct: Seq[Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val ranked = df.withColumn("__rn", row_number().over(w))
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val qdf = df.sparkSession.createDataFrame(
      qsPct.map(q => Tuple1(q.toLong))).toDF("q_pct")
    ranked.join(broadcast(counts), keys)
      .crossJoin(broadcast(qdf))
      .withColumn("__pos",
        col("q_pct").cast("double") / 100.0 * (col("n") - lit(1)))
      .withColumn("__lo", floor(col("__pos")).cast("long") + 1)
      .withColumn("__hi", least(col("__lo") + 1, col("n")))
      .filter(col("__rn") === col("__lo") || col("__rn") === col("__hi"))
      .groupBy(keys.map(col) :+ col("q_pct"): _*)
      .agg(max(col("n")).as("n"),
        max(when(col("__rn") === col("__lo"), col(valueCol))).as("__ylo"),
        max(when(col("__rn") === col("__hi"), col(valueCol))).as("__yhi"),
        max(col("__pos")).as("__p"))
      .select(keys.map(col) :+ col("q_pct") :+ col("n") :+
        d6(col("__ylo") + (col("__p") - floor(col("__p"))) *
          (col("__yhi") - col("__ylo"))).as("f"): _*)
  }

  /** Pinball loss of per-(key, hour-of-day) climatology quantile
    * forecasts, trained on rows where `isTrain` and scored on the
    * rest. For each requested quantile q (as percent, exact integer
    * labels): L = mean over eval rows of
    * q·(y−f) if y ≥ f else (1−q)·(f−y). Output:
    * (key, q_pct, n, pinball). Forecast quantiles come from
    * [[quantileTable]] — engine-identical interpolation.
    */
  def pinballClimatology(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, isTrain: Column, quantilesPct: Seq[Int]): DataFrame = {
    val base = df.select(col(keyCol).as("k"), hour(col(tsCol)).as("hod"),
      d6(col(valueCol)).as("y"), isTrain.as("tr"))
    val forecasts = quantileTable(base.filter(col("tr")), Seq("k", "hod"),
        "y", quantilesPct)
      .select(col("k"), col("hod"), col("q_pct"), col("f"))
    val eval = base.filter(!col("tr"))
      .join(broadcast(forecasts), Seq("k", "hod"))
      .withColumn("loss",
        d6(when(col("y") >= col("f"),
          col("q_pct").cast("double") / 100.0 * (col("y") - col("f")))
          .otherwise((lit(1.0) - col("q_pct").cast("double") / 100.0) *
            (col("f") - col("y")))))
    eval.groupBy(col("k"), col("q_pct"))
      .agg(count(lit(1)).as("n"),
        d6(sum(col("loss").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("pinball"))
  }

  /** Split-conformal interval around the seasonal-naive point
    * forecast: residual quantile q̂ at `alphaPct` coverage from the
    * CALIBRATION half (hash-split by bucket), coverage measured on the
    * other half. Output per key:
    * (k, n_cal, n_eval, qhat, coverage, cov_ok) where cov_ok certifies
    * coverage ≥ (alphaPct−5)/100 — finite-sample slack over the
    * conformal guarantee.
    */
  def conformalSeasonalNaive(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, seasonSeconds: Long, alphaPct: Int): DataFrame = {
    val s = SeriesOps.hourlySeries(df, keyCol, tsCol, valueCol)
    val hist = s.select(col("k"), (col("h") + seasonSeconds).as("h"),
      col("m").as("f"))
    val paired = s.join(hist, Seq("k", "h"))
      .withColumn("r", d6(abs(col("m") - col("f"))))
      .withColumn("cal", pmod((col("h") / 3600L).cast("long"), lit(2L)) === 0)
    val qhat = quantileTable(paired.filter(col("cal")), Seq("k"), "r",
        Seq(alphaPct))
      .select(col("k"), col("n").as("n_cal"), col("f").as("qhat"))
    paired.filter(!col("cal"))
      .join(broadcast(qhat), "k")
      .groupBy(col("k"), col("n_cal"), col("qhat"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("r") <= col("qhat"), 1L).otherwise(0L)).as("n_in"))
      .select(col("k"), col("n_cal"), col("n_eval"), col("qhat"),
        d6(col("n_in").cast("double") / col("n_eval")).as("coverage"),
        (col("n_in").cast("double") / col("n_eval") >=
          (alphaPct - 5) / 100.0).cast("long").as("cov_ok"))
  }
}
