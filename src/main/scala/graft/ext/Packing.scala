package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.PrefixSum

/** Sequence packing: assign documents to fixed-capacity token bins for
  * training-batch construction (extension — the corpus-scale sibling of
  * the reference's fixed 10-minute binning).
  *
  * Strategy: offset packing in deterministic hash order — documents
  * fill bins contiguously by their global token offset; a document
  * whose span crosses a bin boundary is assigned to the bin its start
  * falls in (standard packing-with-truncation; bins overflow by at
  * most one document's tail). Properties that matter at corpus scale:
  *  - fully distributed: the only global structure is the
  *    [[graft.ops.PrefixSum]] chunk directory;
  *  - deterministic and engine-reproducible: bin assignment depends
  *    only on the (hash, key) total order and integer sums, so the
  *    DuckDB oracle recomputes it exactly;
  *  - stable-ish under growth: hash order scatters new documents
  *    instead of appending them all to the last bins.
  */
object Packing {

  /** Assign each row a `bin_id` and `bin_offset` packing `sizeCol`
    * (integral token counts) into bins of `binCapacity`, filling in
    * `md5(salt || key)` order.
    */
  def assignBins(
      df: DataFrame,
      keyCol: String,
      sizeCol: String,
      binCapacity: Long,
      salt: String): DataFrame = {
    require(binCapacity > 0, s"binCapacity must be positive: $binCapacity")
    // 32-bit hash as long; chunk the prefix sum into 256 hash ranges.
    val hashed = df.withColumn("__h",
      conv(Sampling.hashHex(col(keyCol), salt), 16, 10).cast("long"))
    PrefixSum.runningTotal(hashed, "__h", sizeCol, "__start",
        chunkSpan = (1L << 32) / 256, tieBreak = Seq(keyCol),
        // corpus rows — must stream through the scan, never materialize
        boundedInput = false)
      .withColumn("bin_id", expr(s"__start div $binCapacity"))
      .withColumn("bin_offset", col("__start") % binCapacity)
      .drop("__h", "__start")
  }
}
