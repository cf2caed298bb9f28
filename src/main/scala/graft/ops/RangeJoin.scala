package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
