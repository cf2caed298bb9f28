package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe GLOBAL window frames (SURVEY.md §2.5 extension).
  *
  * `Window.orderBy(t)` with no partition keys moves every row to one
  * partition — fine for a bounded resampled series, a scale-killer on a
  * long one. For bounded row-frames (`rowsBetween(-p, f)`, `lag`/`lead`)
  * the global result is recoverable from a KEYED window: partition by a
  * coarse time chunk and replicate the few boundary rows each chunk
  * needs from its neighbors ("carries"). Chunk boundaries are time
  * boundaries, so the `p` rows globally preceding a chunk always lie in
  * its `p` nearest nonempty predecessor chunks — the carry set is exact,
  * not approximate.
  *
  * Shape of the plan: the data-sized windows are all partitioned by
  * `__chunk`; the cross-chunk wiring runs over the chunk directory (one
  * row per nonempty chunk) — provably tiny, broadcast back. The
  * directory gets a dense ascending index from a distributed range sort
  * + `zipWithIndex` (NOT an unpartitioned window — the plan keeps zero
  * single-partition nodes even there), and neighbor chunks become a
  * plain equi-join on index offsets. Boundary-row extraction is a
  * `row_number() <= k` filter, which [[graft.functions.RewriteWindowTopK]]
  * plans as the bounded-heap [[graft.plans.TopKPerKey]] — no per-chunk
  * sort, no data-sized shuffle beyond the one keyed window.
  *
  * Usage:
  * {{{
  * val chunked = ChunkedWindow.withCarries(series, "bucket_start", 86400L, 1, 1)
  * val w = Window.partitionBy(ChunkedWindow.chunk).orderBy("bucket_start")
  * val out = ChunkedWindow.finish(
  *   chunked.select(..., avg("v").over(w.rowsBetween(-1, 1)), ...))
  * }}}
  *
  * Requirements: `orderCol` is numeric (epoch seconds) and unique per
  * row — the natural state of a resampled series. With duplicate order
  * values the carry selection's tie-break may differ from the global
  * window's, changing frame contents at chunk edges.
  */
object ChunkedWindow {

  /** Name of the chunk partition column added by [[withCarries]]. */
  val chunk = "__chunk"

  /** Name of the carry-marker column added by [[withCarries]]. */
  val carry = "__carry"

  /** Dense ascending index over the distinct long values of `keyCol`:
    * output (keyCol, __idx) with __idx = 0..n-1 in keyCol order. Range
    * sort + `zipWithIndex` — distributed at any directory size, and
    * deterministic (the values are distinct and totally ordered).
    */
  private[ops] def denseIndex(distinctKeys: DataFrame, keyCol: String): DataFrame = {
    val spark = distinctKeys.sparkSession
    val rows = distinctKeys.select(col(keyCol).cast("long")).orderBy(keyCol)
      .rdd.zipWithIndex.map { case (r, i) => Row(r.getLong(0), i) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("__idx", LongType, nullable = false))))
  }

  /** Tag `df` with `__chunk` = floor(orderCol / chunkSeconds) and
    * `__carry` = false, then union in the carry rows: for each chunk,
    * the `before` rows globally preceding it and the `after` rows
    * globally following it, re-tagged with the target chunk and
    * `__carry` = true. Window over `partitionBy(chunk).orderBy(orderCol)`
    * and drop carries with [[finish]]: bounded row-frames up to
    * `before` preceding / `after` following rows then equal the global
    * `Window.orderBy(orderCol)` result on every surviving row.
    *
    * `df` is traversed three times (base + each carry direction) — at
    * scale, persist the input if it is expensive to recompute.
    */
  def withCarries(
      df: DataFrame,
      orderCol: String,
      chunkSeconds: Long,
      before: Int,
      after: Int): DataFrame = {
    require(chunkSeconds > 0, s"chunkSeconds must be positive: $chunkSeconds")
    require(before >= 0 && after >= 0, s"carry depths must be >= 0: $before, $after")
    val t = col(orderCol)
    val tagged = df.withColumn(chunk, floor(t / chunkSeconds).cast("long"))
    val base = tagged.withColumn(carry, lit(false))
    if (before == 0 && after == 0) return base

    val dirIdx = denseIndex(tagged.select(col(chunk)).distinct(), chunk)

    def carries(depth: Int, descending: Boolean): Option[DataFrame] =
      if (depth == 0) None
      else {
        // Source chunk at dense index j serves the `depth` neighbors on
        // the carry direction's side: targets j+1..j+depth when carrying
        // forward (before-rows), j-depth..j-1 when carrying backward.
        val (lo, hi) =
          if (descending) (col("__idx") + 1, col("__idx") + depth)
          else (col("__idx") - depth, col("__idx") - 1)
        val pairs = dirIdx
          .select(col(chunk), explode(sequence(lo, hi)).as("__tidx"))
          .join(broadcast(
            dirIdx.select(col(chunk).as("__target"), col("__idx").as("__tidx"))),
            "__tidx")
          .select(col(chunk), col("__target"))
        // Boundary rows per source chunk: last `depth` rows (carrying
        // forward) or first `depth` rows (carrying backward). The
        // row_number filter plans as bounded-heap TopKPerKey.
        val edgeOrder = if (descending) t.desc else t.asc
        val wEdge = Window.partitionBy(chunk).orderBy(edgeOrder)
        val edges = tagged
          .withColumn("__rn", row_number().over(wEdge))
          .filter(col("__rn") <= depth)
          .drop("__rn")
        // Candidates = edge rows of each target's neighbor chunks; keep
        // the `depth` globally nearest per target. Both sides tiny.
        val wSel = Window.partitionBy("__target").orderBy(edgeOrder)
        Some(edges.join(broadcast(pairs), chunk)
          .withColumn("__rn", row_number().over(wSel))
          .filter(col("__rn") <= depth)
          .drop("__rn", chunk)
          .withColumnRenamed("__target", chunk)
          .withColumn(carry, lit(true)))
      }

    Seq(carries(before, descending = true), carries(after, descending = false))
      .flatten
      .foldLeft(base)((acc, c) => acc.unionByName(c.select(acc.columns.map(col): _*)))
  }

  /** Drop the carry rows and helper columns after the keyed windows ran. */
  def finish(df: DataFrame): DataFrame =
    df.filter(!col(carry)).drop(chunk, carry)
}
