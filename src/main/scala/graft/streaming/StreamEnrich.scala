package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stream-static enrichment join — the streaming face of the J2/R2
  * metadata-attachment pattern (reference `compile-solrad.py:72-126`
  * attaches station coordinates batch-wise; a live CAMS feed needs the
  * same join continuously).
  *
  * Spark's stream-static join re-evaluates the static side per
  * micro-batch; with the explicit `broadcast()` hint the streaming side
  * is never shuffled — per batch the plan is the same
  * BroadcastHashJoin as the batch pipeline, so the operator scales with
  * the stream's partitioning regardless of throughput. The static side
  * must stay broadcast-small (station metadata: dozens of rows at any
  * data scale).
  *
  * `left_outer` keeps unmatched stream rows (metadata columns null) for
  * quarantine-style flows; `inner` (default) drops them — the
  * validation semantics of the batch compile path.
  */
object StreamEnrich {

  def enrich(
      stream: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"stream-static enrichment supports inner/left_outer, got $joinType")
    stream.join(broadcast(dim), keys, joinType)
  }
}
