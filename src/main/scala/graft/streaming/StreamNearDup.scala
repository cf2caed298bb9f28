package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Streaming near-dup ingest — the continuous form of the incremental
  * MinHash store ([[graft.ext.Dedup.minHashPairsIncremental]]), the
  * operation a production corpus pipeline runs on arrival rather than
  * nightly. Each micro-batch:
  *
  *  1. probes the persisted store: documents near-dup to ANYTHING
  *     ingested earlier are dropped (O(batch) shuffle, zero store-side
  *     Exchange — the store scan's bucketing carries both joins);
  *  2. resolves near-dups WITHIN the batch with the same banding +
  *     alternating-star cluster closure, keeping each cluster's min-id
  *     canonical;
  *  3. appends the survivors' band rows + signatures to the store
  *     (bucket spec preserved) and their rows to the output directory —
  *     so batch N+1 dedups against batch N automatically.
  *
  * State lives in the STORE, not in Spark streaming state: there is no
  * watermark and no state-store growth — the memory of "what have I
  * seen" is the bucketed table itself, which is exactly what makes the
  * same store shareable between the nightly batch path and this stream.
  *
  * Restart semantics: the standard foreachBatch contract — the output
  * dir append and the store append are not atomic, so a crash between
  * them can replay a batch; both writes are per-doc idempotent only if
  * the source replays whole batches (file source + checkpoint does).
  */
object StreamNearDup {

  def ingest(
      docs: DataFrame, idCol: String, textCol: String, storeName: String,
      outPath: String, checkpoint: String,
      shingleN: Int = 3, perms: Int = 64, bands: Int = 16,
      minJaccard: Double = 0.7, minEst: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          val vsStore =
            if (spark.catalog.tableExists(s"${storeName}_bands")) {
              val hits = Dedup.minHashPairsIncremental(
                  b, idCol, textCol, storeName, shingleN, perms, bands, minEst)
                .select(col("id_new").as(idCol)).distinct()
              b.join(hits, Seq(idCol), "left_anti")
            } else b
          val pairs = Dedup.minHashPairs(
            vsStore, idCol, textCol, shingleN, perms, bands, minJaccard)
          val kept = Dedup.keepCanonical(vsStore, idCol, pairs)
            .localCheckpoint(true) // two consumers below; dedup the work
          Dedup.appendMinHashStore(
            kept, idCol, textCol, storeName, shingleN, perms, bands)
          kept.write.mode("append").parquet(outPath)
        } finally { b.unpersist(); () }
      }
      .start()
}
