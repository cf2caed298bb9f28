package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted per-day fixed-grid histogram store — the QUANTILE twin of
  * [[SketchStore]] (distinct counts) and the MinHash band store
  * (near-dup): each day's ingest reduces to at most `bins` (day, bin,
  * count) rows; a date-range quantile query merges the selected days'
  * bin counts — work proportional to |days|·bins, never to rows — and
  * answers "p95 of any window" without rescanning raw data.
  *
  * Unlike a t-digest blob the merged structure here is plain integer
  * addition on a FIXED grid, which buys two properties a 100 TB
  * monitoring deployment wants: merge is exact and order-independent
  * (no centroid drift), and the estimate is a deterministic function
  * of the counts — both engines replay it bit-for-bit, so the gate is
  * hash-exact, not a tolerance contract. The cost is a rigid error
  * bound: an estimate is off by at most one bin width (interpolated
  * inside the bracket bin), the documented trade against adaptive
  * sketches.
  */
object HistogramStore {

  /** The bin of a value on the [lo, hi) grid, clamped into
    * [0, bins-1]. Values are rounded to 6 dp first (the repo's score
    * contract) so the float division sees identical operands on both
    * engines.
    */
  private def binOf(v: org.apache.spark.sql.Column, lo: Double, hi: Double,
      bins: Int) = {
    val w = (hi - lo) / bins
    least(greatest(floor((round(v, 6) - lo) / w), lit(0)), lit(bins - 1))
      .cast("long")
  }

  /** Build (overwrite) the store: per (day, bin) counts. The aggregate
    * is the only data-sized pass; the store is ≤ |days|·bins rows.
    */
  def build(df: DataFrame, tsCol: String, valueCol: String, table: String,
      lo: Double, hi: Double, bins: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    dailyBins(df, tsCol, valueCol, lo, hi, bins)
      .write.mode("overwrite").saveAsTable(table)
  }

  /** Incremental ingest: bin ONLY the new batch's days and append —
    * O(batch) per ingest; the store is never read or reshuffled.
    * Re-ingesting a day appends additional count rows for it, which
    * the additive merge at query time absorbs exactly.
    */
  def ingest(batch: DataFrame, tsCol: String, valueCol: String,
      table: String, lo: Double, hi: Double, bins: Int): Unit =
    dailyBins(batch, tsCol, valueCol, lo, hi, bins)
      .write.mode("append").saveAsTable(table)

  private def dailyBins(df: DataFrame, tsCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 4096, s"bins must be in [2, 4096]: $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    df.filter(col(valueCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"),
        binOf(col(valueCol), lo, hi, bins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates over a day range from the store alone. For
    * each q in `qPcts` (integer percent): target rank t = ⌈q·N/100⌉
    * (exact long arithmetic), bracket bin b = first with cumulative ≥
    * t, estimate = linear interpolation inside b's [edge, edge+w)
    * span at fraction (t − cum_before)/count_b. Output: (q_pct, n,
    * est) — every arithmetic step is exact integers until the one
    * final double expression, so the estimate replays identically in
    * any engine holding the same counts.
    *
    * The cumulation is a triangular broadcast self-join of the ≤
    * `bins`-row merged table — never a window, never a rescan of data.
    */
  def rangeQuantiles(spark: SparkSession, table: String,
      fromDay: String, toDay: String, qPcts: Seq[Int],
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 100),
      s"q percents must lie in [1, 100]: $qPcts")
    val w = (hi - lo) / bins
    val merged = spark.table(table)
      .filter(col("day") >= lit(fromDay) && col("day") <= lit(toDay))
      .groupBy("bin").agg(sum("cnt").as("cnt"))
    val cum = merged
      .join(broadcast(merged.select(col("bin").as("b2"),
        col("cnt").as("c2"))), col("b2") <= col("bin"))
      .groupBy("bin", "cnt").agg(sum("c2").as("cum"))
      .withColumn("cum_before", col("cum") - col("cnt"))
    val targets = merged.agg(sum("cnt").as("n"))
      .crossJoin(broadcast(
        spark.createDataFrame(qPcts.map(Tuple1(_))).toDF("q_pct")))
      // ⌈q·N/100⌉: (q·N + 99) div 100 for positive N. q·N + 99 ≤
      // 100·N + 99 < 2⁵³ for any N < 9e13, so the floor-division is
      // exact (Spark's `/` on longs is a double divide).
      .withColumn("t",
        floor((col("q_pct").cast("long") * col("n") + 99L) / 100L)
          .cast("long"))
    cum.join(broadcast(targets),
        col("cum") >= col("t") && col("cum_before") < col("t"))
      .select(col("q_pct"), col("n"),
        round(lit(lo) + lit(w) * col("bin") +
          lit(w) * (col("t") - col("cum_before")).cast("double") /
            col("cnt"), 6).as("est"))
  }
}
