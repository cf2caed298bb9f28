package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Linkage

/** Streaming Fellegi–Sunter record linkage — the continuous form of
  * [[graft.ext.Linkage]]: records arrive in micro-batches, and every
  * batch must link (a) within itself and (b) against everything
  * ingested before it, without ever rescanning history row-by-row.
  *
  * Same state design as [[StreamNearDup]]: the memory of "what have I
  * seen" is a BUCKETED block-keyed record store, not Spark streaming
  * state — no watermark, no state-store growth, and the same store
  * serves the nightly batch path. Per micro-batch:
  *
  *  1. within-batch candidate pairs via [[Linkage.blockedPairs]]
  *     (hot-block cap applies per batch);
  *  2. cross-batch candidate pairs = batch × store joined on the block
  *     keys (the store scan's bucketing carries the join — zero
  *     store-side Exchange), with the STORE side capped per block at
  *     probe time (row_number by id <= maxBlock, the blockedPairs
  *     spelling — a hot block accreted across appends degrades recall,
  *     never wall time), scored by the SAME field weights and
  *     re-oriented id_a < id_b to match the batch operator's output;
  *  3. classified pairs append to the output; the batch's records
  *     append to the store (bucket spec preserved).
  *
  * Restart semantics are the standard foreachBatch contract (the
  * output append and the store append are not atomic; a replayed
  * batch is idempotent only per the source's whole-batch replay).
  */
object StreamLinkage {

  /** `scores` builds the weight columns from `_a`/`_b`-suffixed pair
    * columns — the same shapes [[Linkage.classify]] takes.
    */
  def ingest(
      records: DataFrame, idCol: String, blockCols: Seq[String],
      scores: DataFrame => Seq[Column],
      matchMin: Long, possibleMin: Long,
      storeName: String, outPath: String, checkpoint: String,
      buckets: Int = 8, maxBlock: Int = 10000,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          val others = b.columns.filterNot(c =>
            c == idCol || blockCols.contains(c)).toSeq
          def side(df: DataFrame, s: String) = df.select(
            blockCols.map(col) ++
              (col(idCol).as(s"id$s") +: others.map(c => col(c).as(s"$c$s"))): _*)
          val within = Linkage.blockedPairs(b, idCol, blockCols, maxBlock)
          val classifiedWithin = Linkage.classify(
            within, scores(within), matchMin, possibleMin)
          val classified =
            if (spark.catalog.tableExists(storeName)) {
              // The cross-batch join must cap the STORE side per block
              // just as blockedPairs caps within-batch blocks: the
              // store accretes over the stream's lifetime, so an
              // uncapped hot (block) bucket would charge every later
              // micro-batch |hot-block| fan-out, growing without bound
              // — the exact degenerate case maxBlock exists for. Same
              // spelling as blockedPairs (rank by id, overflow excluded
              // — recall degrades, wall time never); the row_number
              // rides the store's bucketing, zero store-side Exchange.
              val capW = org.apache.spark.sql.expressions.Window
                .partitionBy(blockCols.map(col): _*).orderBy(col(idCol))
              val store = spark.table(storeName)
                .withColumn("__br", row_number().over(capW))
                .filter(col("__br") <= maxBlock)
                .drop("__br")
              val cross = side(b, "_a")
                .join(side(store, "_b"), blockCols)
                .filter(col("id_a") =!= col("id_b"))
              val crossCls = Linkage.classify(
                cross, scores(cross), matchMin, possibleMin)
              // canonical orientation: low id first, as blockedPairs emits
              crossCls.select(
                least(col("id_a"), col("id_b")).as("id_a"),
                greatest(col("id_a"), col("id_b")).as("id_b"),
                col("score"), col("verdict"))
                .unionByName(classifiedWithin)
            } else classifiedWithin
          classified.write.mode("append").parquet(outPath)
          graft.io.Bucketing.appendBucketed(b, storeName, blockCols, buckets)
        } finally { b.unpersist(); () }
      }
      .start()
}
