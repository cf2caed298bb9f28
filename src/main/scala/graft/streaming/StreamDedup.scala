package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextStats

/** Streaming exact deduplication for continuous ingestion (extension):
  * drop documents whose content fingerprint was already seen, with
  * watermark-bounded state — the streaming face of
  * [[graft.ext.Dedup.dropExactDuplicates]].
  *
  * State is keyed by the 64-bit content fingerprint, never the document
  * body, so the state store stays small (8 bytes + overhead per distinct
  * doc inside the watermark horizon).
  */
object StreamDedup {

  def dropDuplicateDocs(
      stream: DataFrame,
      timeCol: String,
      textCol: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("__fp", TextStats.fingerprintMd5(col(textCol)))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
