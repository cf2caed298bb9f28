package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys (SURVEY §7.4 #5 / builder
  * scale checklist).
  *
  * At 100 TB a handful of keys (one station's sensor storm, one
  * degenerate dedup fingerprint) can hold a full shuffle partition
  * hostage. Two-phase salted aggregation spreads one logical key over
  * `saltBuckets` physical shuffle keys:
  *
  *   phase 1: groupBy(key, salt) partial aggregate  (big, balanced)
  *   phase 2: groupBy(key) final combine             (tiny)
  *
  * AQE's skew-join handling covers joins; this covers aggregations,
  * which AQE does not rebalance. Only algebraic aggregates (sum/count/
  * min/max — anything with a combine step) are expressible this way;
  * avg is derived as sum/count.
  */
object Salting {

  /** Deterministic salt in [0, saltBuckets): hash of the full row's
    * grouping-independent content would break combinability, so salt on
    * a uniformly-distributed existing column (e.g. an id).
    */
  def salt(c: Column, saltBuckets: Int): Column = pmod(hash(c), lit(saltBuckets))

  /** Salted sum/count/avg of `valueCol` grouped by `keys`. Equivalent to
    * `df.groupBy(keys).agg(sum, count, avg)` for any input, but the
    * first shuffle is keyed by (keys, salt), bounding per-task input to
    * ~1/saltBuckets of the hottest key.
    */
  def saltedStats(
      df: DataFrame, keys: Seq[String], valueCol: String,
      saltCol: Column, saltBuckets: Int): DataFrame = {
    val phase1 = df
      .withColumn("__salt", salt(saltCol, saltBuckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol)).as("__psum"),
        count(col(valueCol)).as("__pcnt"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as(s"n_$valueCol"))
      .withColumn(s"avg_$valueCol", col(s"sum_$valueCol") / col(s"n_$valueCol"))
  }

  /** Salted inner equi-join for the case AQE's skew handling can't
    * reach: BOTH sides too large to broadcast and the big side's join
    * key has hot values. Each big-side row gets a deterministic salt
    * from `saltFrom` (a big-side column whose values spread WITHIN one
    * key — a line number, an event id; never the join key itself, whose
    * rows must split); the small side replicates across all
    * `saltBuckets`, so the shuffle key becomes (key, salt) and a hot
    * key's rows land on `saltBuckets` tasks instead of one.
    *
    * Result is exactly `big.join(small, bigKey === smallKey)` (every
    * big row meets every small row of its key exactly once, in the
    * replica matching its salt). Cost trade, stated: the small side's
    * shuffle volume multiplies by `saltBuckets` — size it so
    * small × buckets still beats the hot key's straggler tail.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      saltFrom: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt is reserved by saltedJoin")
    val b = big.withColumn("__salt", salt(saltFrom, saltBuckets))
    val s = small
      .withColumn("__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    b.join(s, b("__salt") === s("__salt") && col(bigKey) === col(smallKey))
      .drop("__salt")
  }
}
