package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series diagnostics over resampled (keyed, hourly-bucketed)
  * series: autocorrelation, lagged cross-correlation, CUSUM
  * changepoints, truncated EWMA smoothing, and an STL-lite
  * trend/seasonal/remainder split.
  *
  * The reference stops at resample + linregress
  * (code/process-cams-solrad-ts.py:169-230); these are the follow-on
  * questions an operator asks of the same resampled series ("is the
  * sensor drifting?", "does GHI lead or lag the model?", "when did the
  * level shift?"). All of them are built on the repo's determinism
  * contract: bucket means come from decimal-exact sums rounded to
  * 6 dp, correlations use decimal(18,6) series values whose products
  * and sums stay exact in decimal(38,12), and the one double formula
  * at the end is IEEE-reproducible across engines.
  *
  * Scale shape: the hourly resample is the only shuffle that sees raw
  * rows (partial-aggregate, bounded by |keys|·|hours| out); every
  * correlation joins RESAMPLED series — tiny relative to the scan —
  * and per-key windows follow the [[ChunkedWindow]] story when one
  * key outgrows a partition.
  */
object SeriesOps {

  private def d6(c: Column): Column = round(c, 6)

  /** (key, hour-epoch, mean) hourly resample with decimal-exact means
    * rounded to 6 dp — the shared input of everything below.
    */
  def hourlySeries(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(keyCol).as("k"),
        TimeOps.bucketStartEpoch(col(tsCol), 3600L).as("h"))
      .agg(d6(sum(d6(col(valueCol)).cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("m"))

  /** Pearson correlation of (x, y) pairs per group from exact decimal
    * sufficient statistics; input columns must already be
    * decimal(18,6)-safe (6 dp-rounded doubles).
    */
  private def pearson(paired: DataFrame, groupCols: Seq[String]): DataFrame = {
    val x = d6(col("x")).cast("decimal(18,6)")
    val y = d6(col("y")).cast("decimal(18,6)")
    paired
      .select(groupCols.map(col) :+ x.as("dx") :+ y.as("dy"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("dx")).cast("decimal(38,12)").as("sx"),
        sum(col("dy")).cast("decimal(38,12)").as("sy"),
        sum((col("dx") * col("dy")).cast("decimal(38,12)")).as("sxy"),
        sum((col("dx") * col("dx")).cast("decimal(38,12)")).as("sxx"),
        sum((col("dy") * col("dy")).cast("decimal(38,12)")).as("syy"))
      .select({
        val vx = col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        val vy = col("n").cast("double") * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")
        val num = col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        // null (not a crash, not ±inf) when either side is constant
        groupCols.map(col) :+ col("n") :+
          when(vx > 0 && vy > 0, d6(num / sqrt(vx * vy))).as("r")
      }: _*)
  }

  /** Autocorrelation of each key's hourly series at lags 1..maxLag
    * (hours). Gap-correct: pairs come from an equi-join on
    * `h = h' + lag·3600`, so missing buckets drop pairs instead of
    * silently shifting them. Output (k, lag, n, r).
    */
  def acf(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    val s = hourlySeries(df, keyCol, tsCol, valueCol)
    val lags = s.sparkSession.range(1, maxLag + 1).select(col("id").as("lag"))
    val shifted = s.crossJoin(broadcast(lags))
      .select(col("k"), col("lag"), (col("h") + col("lag") * 3600L).as("h"),
        col("m").as("y"))
    val paired = s.join(shifted, Seq("k", "h"))
      .select(col("k"), col("lag"), col("m").as("x"), col("y"))
    pearson(paired, Seq("k", "lag"))
  }

  /** Lagged cross-correlation between two keys' hourly series:
    * r(lag) for lag ∈ [−maxLag, maxLag] where positive lag means
    * `aKey` LEADS (a at h correlates with b at h+lag). Output
    * (lag, n, r) plus `best` marking the max-|r| row (ties → smallest
    * lag), answering "does GHI lead the model or trail it".
    */
  def crossCorrelation(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, aKey: String, bKey: String, maxLag: Int): DataFrame = {
    val s = hourlySeries(df, keyCol, tsCol, valueCol)
    val a = s.filter(col("k") === aKey).select(col("h"), col("m").as("x"))
    val b = s.filter(col("k") === bKey).select(col("h"), col("m").as("y"))
    val lags = s.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").as("lag"))
    val paired = a.crossJoin(broadcast(lags))
      .select(col("lag"), (col("h") + col("lag") * 3600L).as("h"), col("x"))
      .join(b, "h")
    val r = pearson(paired, Seq("lag"))
    // |r| ranking on rounded values; ties break to the smallest lag —
    // deterministic because r is 6 dp-rounded before the compare.
    val best = r.orderBy(abs(col("r")).desc, col("lag").asc).limit(1)
      .select(col("lag").as("lag"), lit(1L).as("best"))
    r.join(best, Seq("lag"), "left")
      // 0/1 BIGINT, never null: a nullable long renders as float64 at
      // the pandas compare (safe-alphabet law)
      .select(col("lag"), col("n"), col("r"),
        coalesce(col("best"), lit(0L)).as("best"))
  }

  /** CUSUM level-shift statistic per key: S_i = Σ_{j≤i}(x_j − μ) over
    * the (ts, idCol)-ordered series; reports the peak |S| and where it
    * happened — the classic "when did the mean move" detector.
    * Output (key, n, mu, max_s, at_idx) where at_idx is the 1-based
    * position of the (earliest) peak.
    *
    * The cumulative sum is an exact decimal of 6 dp inputs and
    * i·μ is one IEEE multiply, so both engines agree; the window is
    * keyed (ChunkedWindow applies past partition scale).
    */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = df
      .select(col(keyCol), col(tsCol), col(idCol),
        d6(col(valueCol)).cast("decimal(18,6)").as("v"))
      .withColumn("cum", sum(col("v")).over(w))
      .withColumn("i", count(lit(1)).over(w))
    val mu = stats.groupBy(col(keyCol)).agg(
      (sum(col("v")).cast("double") / count(lit(1))).as("mu"),
      count(lit(1)).as("n"))
    val dev = stats.join(broadcast(mu), keyCol)
      .withColumn("s",
        col("cum").cast("double") - col("i").cast("double") * col("mu"))
      .withColumn("abs_s", abs(col("s")))
    val peak = dev.groupBy(col(keyCol))
      .agg(max(col("abs_s")).as("peak"))
    dev.join(broadcast(peak), keyCol)
      .filter(col("abs_s") === col("peak"))
      .groupBy(col(keyCol), col("n"), d6(col("mu")).as("mu"),
        d6(col("peak")).as("max_s"))
      .agg(min(col("i")).as("at_idx"))
      .select(col(keyCol), col("n"), col("mu"), col("max_s"), col("at_idx"))
  }

  /** Truncated adjust-mode EWMA per key: weights β^i over the last
    * `terms` observations (β = 1 − α as an EXACT decimal literal, so
    * both engines parse identical doubles), renormalized by the
    * weights actually present — pandas `ewm(adjust=True)` truncated at
    * a fixed horizon, which is what a distributed engine can do
    * without a sequential scan. One keyed window sort; the per-row
    * fold is a fixed expression tree, evaluated left-to-right
    * identically by any IEEE engine.
    */
  /** β^i = (10−a)^i / 10^i is an exact decimal with i digits: emitted
    * as a literal string so Spark and any SQL oracle parse the SAME
    * double — shared by [[ewmaTruncated]] and its oracle builder.
    */
  def betaLiteral(alphaTenths: Int, i: Int): String =
    java.math.BigDecimal.valueOf(10L - alphaTenths, 1).pow(i).toPlainString

  def ewmaTruncated(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, alphaTenths: Int, terms: Int): DataFrame = {
    require(alphaTenths > 0 && alphaTenths < 10, "alpha must be 0.1..0.9")
    require(terms > 0 && terms <= 16, "terms must be 1..16")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    def beta(i: Int): String = betaLiteral(alphaTenths, i)
    val withLags = (0 until terms).foldLeft(
      df.select(col(keyCol), col(tsCol), col(idCol),
        d6(col(valueCol)).as("v"))) { (d, i) =>
      d.withColumn(s"l$i", lag(col("v"), i).over(w))
    }
    def betaD(i: Int): Column = expr(s"CAST(${beta(i)} AS DOUBLE)")
    val num = (0 until terms).map(i =>
      when(col(s"l$i").isNotNull, col(s"l$i") * betaD(i)).otherwise(lit(0.0)))
      .reduce(_ + _)
    val den = (0 until terms).map(i =>
      when(col(s"l$i").isNotNull, betaD(i)).otherwise(lit(0.0)))
      .reduce(_ + _)
    withLags.select(col(keyCol), col(idCol), col("v").as("value_r"),
      d6(num / den).as("ewma"))
  }

  /** STL-lite decomposition per key: trend = centered rolling mean of
    * ±`half` points (null until the window is full — no edge bias),
    * seasonal = hour-of-day mean of the detrended residual, remainder
    * = residual − seasonal. Returns one row per input row (sampled by
    * the caller) with all three components; every mean is a
    * decimal-exact sum rounded at 6 dp.
    */
  def stlLite(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, half: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-half, half)
    val full = 2 * half + 1
    val trended = df
      .select(col(keyCol), col(tsCol), col(idCol), d6(col(valueCol)).as("v"))
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("trend",
        when(col("wn") === full,
          d6(sum(d6(col("v")).cast("decimal(18,6)")).over(w).cast("double") /
            full)))
      .withColumn("detr", d6(col("v") - col("trend")))
      .withColumn("hod", hour(col(tsCol)))
    val seasonal = trended.filter(col("detr").isNotNull)
      .groupBy(col(keyCol), col("hod"))
      .agg(d6(sum(col("detr").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("seasonal"))
    trended.join(broadcast(seasonal), Seq(keyCol, "hod"), "left")
      .select(col(keyCol), col(idCol), col("v").as("value_r"), col("trend"),
        when(col("trend").isNotNull, col("seasonal")).as("seasonal"),
        when(col("trend").isNotNull, d6(col("detr") - col("seasonal")))
          .as("remainder"))
  }
}
