package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (builder checklist:
  * "KeyValueGroupedDataset.mapGroupsWithState/flatMapGroupsWithState for
  * custom state"): a per-station ingestion tracker that survives
  * micro-batches — running row count, last observation time, and the
  * largest gap seen between consecutive observations (the thing a solar
  * network operator actually monitors: a station going quiet).
  *
  * State is one small case class per station — bounded by station count,
  * not data volume.
  */
object StatefulTracker {

  case class Obs(station: String, time: Timestamp)
  case class TrackState(n: Long, lastMillis: Long, maxGapMillis: Long)
  case class TrackUpdate(station: String, n: Long, last: Timestamp, maxGapMillis: Long)

  def update(
      station: String,
      rows: Iterator[Obs],
      state: GroupState[TrackState]): Iterator[TrackUpdate] = {
    val sorted = rows.toSeq.sortBy(_.time.getTime)
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(TrackState(0L, Long.MinValue, 0L))
    sorted.foreach { o =>
      val t = o.time.getTime
      val gap = if (st.lastMillis == Long.MinValue) 0L else math.max(0L, t - st.lastMillis)
      st = TrackState(st.n + 1, math.max(st.lastMillis, t), math.max(st.maxGapMillis, gap))
    }
    state.update(st)
    Iterator.single(TrackUpdate(station, st.n, new Timestamp(st.lastMillis), st.maxGapMillis))
  }

  /** Wire the tracker onto a stream of observations. */
  def track(obs: Dataset[Obs]): Dataset[TrackUpdate] = {
    implicit val stateEnc = Encoders.product[TrackState]
    implicit val outEnc = Encoders.product[TrackUpdate]
    obs.groupByKey(_.station)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
