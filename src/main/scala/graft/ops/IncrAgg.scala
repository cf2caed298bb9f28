package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold a new batch into a persisted
  * per-key aggregate state without recomputing history — the batch
  * analog of streaming state, and the only affordable shape once the
  * history is 100 TB and the daily drop is 100 GB.
  *
  * State rows carry the ALGEBRAIC pieces (count, decimal sum, min,
  * max); derived values (avg) are computed at read time from the
  * pieces. Merging is a full-outer join on the key with a
  * coalesce-combine per piece — O(state keys touched + batch keys),
  * and with the state persisted bucketed by key
  * ([[graft.io.Bucketing]]) the join co-locates with zero shuffle on
  * the state side. Sums are decimal so merge order can never produce a
  * different float than a from-scratch recompute: fold(state, batch)
  * is bit-identical to aggregate(history ∪ batch), which is exactly
  * the invariant the oracle and the property spec pin.
  */
object IncrAgg {

  private val SumType = "decimal(28,6)"

  /** Per-key algebraic state of `valueCol` grouped by `keys`:
    * n, sum (decimal), min, max.
    */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "state needs at least one key column")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol).cast(SumType)).as("sum"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max"))
  }

  /** Merge `batch` (raw rows) into an existing `stateDf`. Keys present
    * only in the state pass through untouched; keys only in the batch
    * appear new; overlapping keys combine piecewise.
    */
  def merge(stateDf: DataFrame, batch: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val b = state(batch, keys, valueCol)
      .withColumnsRenamed(
        Map("n" -> "_bn", "sum" -> "_bsum", "min" -> "_bmin", "max" -> "_bmax"))
    stateDf.join(b, keys, "full_outer")
      .select(
        keys.map(col) ++ Seq(
          (coalesce(col("n"), lit(0L)) + coalesce(col("_bn"), lit(0L))).as("n"),
          (coalesce(col("sum"), lit(0).cast(SumType)) +
            coalesce(col("_bsum"), lit(0).cast(SumType)))
            .cast(SumType).as("sum"),
          least(col("min"), col("_bmin")).as("min"),
          greatest(col("max"), col("_bmax")).as("max")): _*)
  }

  /** Read-time view of a state: the derived stats a consumer wants
    * (avg from the exact pieces, sum surfaced as double).
    */
  def view(stateDf: DataFrame, keys: Seq[String]): DataFrame =
    stateDf.select(
      keys.map(col) ++ Seq(
        col("n"),
        col("sum").cast("double").as("sum"),
        // divide in DOUBLE off the exact decimal sum: decimal-division
        // scale rules differ across engines, double division does not.
        round(col("sum").cast("double") / col("n"), 6).as("avg"),
        col("min"),
        col("max")): _*)
}
