package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-interval detection over keyed time series — the "where did
  * my sensor go dark" report the reference's station pipelines imply
  * but never materialize (gaps there surface later as NaN runs after
  * densify; see `code/compile-solrad.py` reindex-to-dense-grid).
  * Detecting the gaps directly, per key, is the operational primitive:
  * it names the outage instead of leaving holes to be interpolated
  * over silently.
  *
  * Scale shape: one keyed window (`lag` over partitionBy key) — a
  * single hash exchange on the series key and a per-key sort, the
  * same budget as any keyed rolling op. Gap arithmetic is integer
  * microseconds end to end (`unix_micros` both here and in the DuckDB
  * oracle via `epoch_us`), so there is no floating-point rounding to
  * disagree about at the threshold boundary.
  */
object Gaps {

  /** Rows where the time since the previous observation of the same
    * key exceeds `thresholdSeconds`: (key, gap_start, gap_end,
    * gap_us, gap_seconds). `tieBreak` makes the lag ordering total
    * when two observations share a timestamp.
    */
  def detect(df: DataFrame, key: String, ts: String, tieBreak: String,
      thresholdSeconds: Long): DataFrame = {
    require(thresholdSeconds > 0, "thresholdSeconds must be positive")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    df.select(col(key), col(ts), col(tieBreak))
      .withColumn("prev_ts", lag(col(ts), 1).over(w))
      .where(col("prev_ts").isNotNull)
      .withColumn("gap_us", unix_micros(col(ts)) - unix_micros(col("prev_ts")))
      .where(col("gap_us") > thresholdSeconds * 1000000L)
      .select(
        col(key),
        col("prev_ts").as("gap_start"),
        col(ts).as("gap_end"),
        col("gap_us"),
        expr("gap_us div 1000000").as("gap_seconds"))
  }
}
