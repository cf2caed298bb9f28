package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join: correlate two live event streams on a
  * key within a bounded time window (clicks to the purchases that
  * follow within N minutes; a ground-sensor stream to the model stream
  * around the same timestamp — the streaming face of the batch
  * [[graft.ops.RangeJoin]] / J1 time-join pattern).
  *
  * Scale shape: Spark buffers both sides in keyed state and co-shuffles
  * on the equi-key. UNBOUNDED state is the stream-stream join's failure
  * mode — the watermark plus the two-sided time-range condition is what
  * lets the engine evict: once the watermark passes `maxLagSec` behind
  * an event it can never match again and its state is dropped. Both are
  * therefore required here, not optional.
  */
object StreamJoin {

  /** Inner-join `left` to the `right` rows with the same `keys` whose
    * `rightTs` lies in `[leftTs + minLagSec, leftTs + maxLagSec]`.
    * Both inputs must be streaming frames with event-time columns;
    * `watermarkDelay` (e.g. "10 minutes") bounds lateness AND state
    * retention on both sides.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      minLagSec: Long, maxLagSec: Long,
      watermarkDelay: String): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one equi-key")
    require(minLagSec <= maxLagSec, "minLagSec must be <= maxLagSec")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val equi: Column = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val range: Column =
      r(rightTs) >= l(leftTs) + expr(s"INTERVAL $minLagSec SECONDS") &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxLagSec SECONDS")
    l.join(r, equi && range, "inner")
  }

  /** LEFT OUTER variant of [[intervalJoin]] — the funnel question the
    * inner join can't answer: which clicks NEVER converted? Matched
    * rows emit as they match; an UNMATCHED left row emits null-padded
    * only once the watermark proves no future right row can land in
    * its interval (state eviction = emission, which is why the
    * watermark is mandatory here, not hygiene: without it unmatched
    * rows would be held forever and never emitted).
    */
  def intervalJoinLeftOuter(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      minLagSec: Long, maxLagSec: Long,
      watermarkDelay: String): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one equi-key")
    require(minLagSec <= maxLagSec, "minLagSec must be <= maxLagSec")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val equi: Column = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val range: Column =
      r(rightTs) >= l(leftTs) + expr(s"INTERVAL $minLagSec SECONDS") &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxLagSec SECONDS")
    l.join(r, equi && range, "left_outer")
  }
}
