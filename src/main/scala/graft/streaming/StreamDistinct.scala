package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming approximate distinct-count per event-time window — live
  * audience/vocabulary size without distinct state. Exact streaming
  * `count(DISTINCT)` is impossible in a micro-batch engine without
  * keeping every seen id in state (unbounded); the HLL++ sketch behind
  * `approx_count_distinct` IS the streaming-legal spelling: per-window
  * state is one constant-size register set, merged across micro-batches
  * exactly like any algebraic aggregate, and the estimate is
  * independent of arrival order or batch boundaries — which is what
  * makes the contract below gate-able at all.
  */
object StreamDistinct {

  /** Tumbling-window approx distinct of `idCol` per (`window`,
    * `keyCols`): one streaming state row per open window × key,
    * constant-size each.
    */
  def windowedApproxDistinct(events: DataFrame, tsCol: String, idCol: String,
      keyCols: Seq[String], windowMinutes: Int,
      rsd: Double = 0.02): DataFrame =
    events.groupBy(
        window(col(tsCol), s"$windowMinutes minutes") +: keyCols.map(col): _*)
      .agg(approx_count_distinct(col(idCol), rsd).as("approx_distinct"))
}
