package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range (interval) join: points matched to intervals containing them —
  * `point.t BETWEEN interval.lo AND interval.hi`, optionally under
  * additional equi-keys.
  *
  * Spark plans a raw BETWEEN join as BroadcastNestedLoopJoin (or a
  * cartesian at scale) because there is no equi-condition. Binning
  * restores one: each point maps to exactly ONE time bin, each interval
  * replicates to every bin it covers, and the join becomes an ordinary
  * hash join on (keys, bin) followed by the exact containment filter.
  * Each (point, interval) pair can only meet in the point's single bin,
  * so no dedup step is needed.
  *
  * Cost model: interval replication = ceil(length / binSeconds) + 1
  * rows; pick `binSeconds` near the typical interval length so
  * replication stays O(1) per interval while bins stay selective. A
  * degenerate interval spanning the whole axis replicates to every bin —
  * the same class of hazard as a hot LSH band key; `maxBins` caps it
  * (wider intervals are dropped with the same degrade-recall-not-
  * wall-time rationale as `Dedup.capBuckets`).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, pointTime: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      keys: Seq[String] = Nil,
      binSeconds: Long = 3600L,
      maxBins: Int = 1024): DataFrame = {
    def bin(c: Column): Column = floor(c / binSeconds)
    val p = points.withColumn("__bin", bin(col(pointTime)))
    val iv = intervals
      .filter(col(hiCol) >= col(loCol))
      .filter(bin(col(hiCol)) - bin(col(loCol)) < maxBins)
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(iv, "__bin" +: keys)
      .filter(col(pointTime) >= col(loCol) && col(pointTime) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-interval OVERLAP join: every (left, right) pair with
    * `l.lo ≤ r.hi && r.lo ≤ l.hi` (closed intervals), optionally under
    * equi-keys — co-presence / concurrent-session / availability-
    * window questions that [[pointInInterval]]'s point probe can't
    * ask.
    *
    * Same binning trick, plus a dedup invariant replacing the "point
    * has one bin" argument: both sides replicate to their covered
    * bins, the hash join meets a candidate pair in EVERY shared bin,
    * and the pair is kept only in the bin of max(l.lo, r.lo) — the
    * overlap's start, which any overlapping pair has exactly one of.
    * No distinct step, so nothing reshuffles after the join.
    *
    * Both time columns are numeric (epoch seconds); `maxBins` caps
    * axis-spanning intervals exactly as in [[pointInInterval]].
    */
  def intervalOverlapJoin(
      left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      keys: Seq[String] = Nil,
      binSeconds: Long = 3600L,
      maxBins: Int = 1024): DataFrame = {
    def bin(c: Column): Column = floor(c / binSeconds)
    def expand(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) >= col(lo))
      .filter(bin(col(hi)) - bin(col(lo)) < maxBins)
      .withColumn("__bin", explode(sequence(bin(col(lo)), bin(col(hi)))))
    expand(left, lLo, lHi).join(expand(right, rLo, rHi), "__bin" +: keys)
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") === bin(greatest(col(lLo), col(rLo))))
      .drop("__bin")
  }

  /** Interval COALESCE per key: merge overlapping/touching [lo, hi]
    * intervals into their union — sessions into availability windows,
    * maintenance tickets into outage spans. Output per merged span:
    * (keys..., span_lo, span_hi, n_merged).
    *
    * The classic sweep, expressed as one keyed window: an interval
    * starts a NEW span iff its lo exceeds the running max hi of every
    * earlier interval (ordered by lo); the span id is the running
    * count of such starts — two window functions over ONE keyed sort,
    * then a per-span aggregate that reuses the window's partitioning.
    * Exact integer endpoints; closed-interval semantics (touching
    * endpoints merge), matching [[intervalOverlapJoin]].
    */
  def coalesceIntervals(df: DataFrame, keys: Seq[String],
      loCol: String, hiCol: String): DataFrame = {
    require(keys.nonEmpty, "coalesceIntervals needs at least one key")
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(loCol), col(hiCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCols: _*)
      .orderBy(col(loCol), col(hiCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.filter(col(hiCol) >= col(loCol))
      .withColumn("__prev_max", max(col(hiCol)).over(w))
      .withColumn("__new",
        when(col("__prev_max").isNull || col(loCol) > col("__prev_max"), 1L)
          .otherwise(0L))
      .withColumn("__span", sum(col("__new")).over(wRun))
      .groupBy(keyCols :+ col("__span"): _*)
      .agg(min(col(loCol)).as("span_lo"), max(col(hiCol)).as("span_hi"),
        count(lit(1)).as("n_merged"))
      .drop("__span")
  }
}
