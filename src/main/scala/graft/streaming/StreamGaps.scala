package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Gaps]]: emit a row the moment a keyed
  * series shows a hole larger than the threshold — the live form of the
  * missing-interval report ([[StatefulTracker]] keeps the summary
  * statistic; this emits each OUTAGE as an append-mode event, which is
  * what pages an operator).
  *
  * State per key is ONE (last-instant, last-id) pair — bounded by key
  * count, independent of volume. Within a micro-batch the group sorts
  * its rows by (instant, id), the same total order the batch operator
  * and its DuckDB oracle use, so on a single AvailableNow batch the
  * emitted set is bit-identical to `Gaps.detect` — which is exactly how
  * the driver gate pins it (`q_st9_stream_gaps` shares the `q_ext_gaps`
  * oracle). Instants are integer microseconds end to end.
  */
object StreamGaps {

  case class GapObs(key: String, tsUs: Long, id: Long)
  case class GapSeen(lastUs: Long, lastId: Long)
  case class GapOut(key: String, gap_start_us: Long, gap_end_us: Long, gap_us: Long)

  def detect(
      key: String,
      rows: Iterator[GapObs],
      state: GroupState[GapSeen],
      thresholdUs: Long): Iterator[GapOut] = {
    val sorted = rows.toSeq.sortBy(o => (o.tsUs, o.id))
    if (sorted.isEmpty) return Iterator.empty
    var prev = state.getOption
    val gaps = Seq.newBuilder[GapOut]
    sorted.foreach { o =>
      prev match {
        case Some(p) if o.tsUs - p.lastUs > thresholdUs =>
          gaps += GapOut(key, p.lastUs, o.tsUs, o.tsUs - p.lastUs)
        case _ => ()
      }
      prev = Some(GapSeen(o.tsUs, o.id))
    }
    prev.foreach(state.update)
    gaps.result().iterator
  }

  /** Wire the detector onto a keyed observation stream. */
  def gaps(obs: Dataset[GapObs], thresholdSeconds: Long): Dataset[GapOut] = {
    require(thresholdSeconds > 0, "thresholdSeconds must be positive")
    val thresholdUs = thresholdSeconds * 1000000L
    implicit val stateEnc = Encoders.product[GapSeen]
    implicit val outEnc = Encoders.product[GapOut]
    obs.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[GapObs], st: GroupState[GapSeen]) =>
          detect(k, it, st, thresholdUs)
      }
  }
}
