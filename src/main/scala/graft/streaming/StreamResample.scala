package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming extension (SURVEY.md §2.10): the reference's
  * batch 10-minute resample exposed as a streaming query. Not required
  * for parity (the reference is batch-only) — this is the scale path for
  * continuous ingestion: file/Kafka source → watermark → tumbling window
  * mean → append sink.
  */
object StreamResample {

  /** Tumbling mean over a streaming frame. `watermark` bounds state and
    * admits late rows up to that delay — the streaming analogue of
    * pandas recomputing bins over all data (which is batch/complete
    * mode; append+watermark is the scalable choice).
    */
  def tumblingMean(
      stream: DataFrame,
      timeCol: String,
      minutes: Int,
      valueCols: Seq[String],
      watermark: String = "20 minutes",
      extraKeys: Seq[String] = Nil): DataFrame = {
    val keyCols = window(col(timeCol), s"$minutes minutes").as("w") +: extraKeys.map(col)
    val aggs = valueCols.map(c => avg(col(c)).as(c)) :+ count(lit(1)).as("n_rows")
    stream
      .withWatermark(timeCol, watermark)
      .groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("time") +: (extraKeys ++ valueCols :+ "n_rows").map(col): _*)
  }
}
