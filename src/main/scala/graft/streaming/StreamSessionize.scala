package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the continuous twin of the batch
  * `q_w2_sessionize` pattern: a user's events belong to one session
  * until a pause longer than `gap`; the closed session is emitted when
  * the NEXT event arrives after the pause, or when the idle timeout
  * fires with no further events.
  *
  * State per user is one (start, last, count) triple — bounded by active
  * users, not events. `idleTimeout = Some(d)` arms a processing-time
  * timeout that closes and EVICTS idle users' sessions (the
  * watermark-analogue for `flatMapGroupsWithState` state); `None` keeps
  * the query timer-free (useful under synchronous test drivers, where a
  * pending timeout keeps scheduling batches). Within a micro-batch
  * events are sorted by event time; across batches ordering is the
  * source's responsibility (same contract as the batch operator's
  * total-order requirement).
  */
object StreamSessionize {

  case class Event(user: String, time: Timestamp)
  case class SessionState(startMillis: Long, lastMillis: Long, nEvents: Long)
  case class Session(
      user: String, start: Timestamp, end: Timestamp, nEvents: Long,
      closedByTimeout: Boolean)

  /** The per-group transition — public so the timeout branch is unit-
    * testable with `TestGroupState` (no stream needed).
    */
  def update(gapMillis: Long, idleTimeout: Option[String])(
      user: String, rows: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // no events for the idle duration: close and evict
      val st = state.get
      state.remove()
      Iterator.single(Session(user,
        new Timestamp(st.startMillis), new Timestamp(st.lastMillis),
        st.nEvents, closedByTimeout = true))
    } else {
      val sorted = rows.toSeq.sortBy(_.time.getTime)
      var closed = List.empty[Session]
      var st = state.getOption.orNull
      sorted.foreach { e =>
        val t = e.time.getTime
        st =
          if (st == null) SessionState(t, t, 1L)
          else if (t - st.lastMillis > gapMillis) {
            closed ::= Session(user,
              new Timestamp(st.startMillis), new Timestamp(st.lastMillis),
              st.nEvents, closedByTimeout = false)
            SessionState(t, t, 1L)
          } else SessionState(st.startMillis, math.max(st.lastMillis, t), st.nEvents + 1)
      }
      if (st != null) {
        state.update(st)
        idleTimeout.foreach(state.setTimeoutDuration)
      }
      closed.reverseIterator
    }
  }

  def sessionize(
      events: Dataset[Event], gapMillis: Long,
      idleTimeout: Option[String] = Some("30 minutes")): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        update(gapMillis, idleTimeout))
  }
}
