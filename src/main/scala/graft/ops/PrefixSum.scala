package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total (exclusive prefix sum) in a global order,
  * WITHOUT a single-partition window — the scan primitive under
  * sequence packing ([[graft.ext.Packing]]), cumulative quotas, and
  * offset assignment.
  *
  * Same decomposition as [[Resample.interpolateLinearChunked]]:
  *  1. rows chunk by `floor(orderCol / chunkSpan)`; within-chunk
  *     running sums are keyed windows (parallel across chunks);
  *  2. per-chunk totals form a directory (one row per chunk) that is
  *     dense-indexed ([[ChunkedWindow.denseIndex]]) and prefix-summed
  *     block-parallel: keyed strict-prefix sums per 4096-chunk block
  *     plus a triangle join over the tiny block directory;
  *  3. chunk offsets broadcast back; row prefix = chunk offset +
  *     within-chunk inclusive sum − own value.
  *
  * The final value is pure integer arithmetic in a total order, so it
  * is engine-reproducible: any system that can sort by
  * (orderCol, tieBreak) and running-sum gets bit-identical output —
  * which is how the DuckDB oracle pins [[graft.ext.Packing]].
  *
  * `orderCol` must be numeric; (orderCol, tieBreak*) must be unique
  * per row for the order (and therefore the prefix) to be well defined.
  */
object PrefixSum {

  /** Add `outCol` = sum of `valueCol` over all rows strictly before the
    * current row in (orderCol, tieBreak*) order.
    */
  def runningTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      chunkSpan: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(chunkSpan > 0, s"chunkSpan must be positive: $chunkSpan")
    val v = col(valueCol)
    val ord: Seq[Column] = col(orderCol) +: tieBreak.map(col)
    val chunked = df.withColumn("__chunk",
      floor(col(orderCol) / chunkSpan).cast("long"))
    val wIn = Window.partitionBy("__chunk").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withIncl = chunked.withColumn("__incl", sum(v).over(wIn))

    // Chunk directory: totals per chunk, dense-indexed, block-scanned.
    val totals = chunked.groupBy(col("__chunk")).agg(sum(v).as("__tot"))
    val blockSize = 4096L
    val tIdx = totals
      .join(broadcast(ChunkedWindow.denseIndex(
        totals.select(col("__chunk")), "__chunk")), "__chunk")
      .withColumn("__blk", (col("__idx") / blockSize).cast("long"))
    val wBlk = Window.partitionBy("__blk").orderBy("__idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkTotals = tIdx.groupBy(col("__blk")).agg(sum(col("__tot")).as("__btot"))
    val blks = blkTotals.select(col("__blk").as("__tblk"))
    val blkOff = blks.join(blkTotals, col("__blk") < col("__tblk"), "left")
      .groupBy(col("__tblk")).agg(sum(col("__btot")).as("__boff"))
    val dirOff = tIdx
      .withColumn("__in_blk", coalesce(sum(col("__tot")).over(wBlk), lit(0L)))
      .join(broadcast(blkOff), col("__blk") === blkOff("__tblk"), "left")
      .select(col("__chunk"),
        (col("__in_blk") + coalesce(col("__boff"), lit(0L))).as("__chunk_off"))

    withIncl.join(broadcast(dirOff), Seq("__chunk"), "left")
      .withColumn(outCol, col("__chunk_off") + col("__incl") - v)
      .drop("__chunk", "__incl", "__chunk_off")
  }
}
