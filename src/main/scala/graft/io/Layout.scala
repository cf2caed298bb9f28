package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned storage layout (the directory-level complement to
  * [[Bucketing]]'s bucket-level co-location): write a time-keyed table
  * partitioned by derived date so that date-ranged reads prune whole
  * directories at PLANNING time — at 100 TB, a one-day query against a
  * year of data must list and read ~1/365th of the files, not filter
  * 100 TB row-by-row. The scan's `PartitionFilters` (asserted in
  * `LayoutSpec`) is the evidence: pruning happens before I/O.
  */
object Layout {

  /** Write `df` to `outDir` as parquet partitioned by the date of
    * `tsCol` (directory per day, Hive-style `p_date=...`). The
    * pre-write repartition ON the partition column means each task
    * holds whole dates, so every directory gets ONE file per writing
    * task instead of one file per (task × date) — the classic
    * small-files failure a naive partitioned write produces.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .repartition(col("p_date"))
      .write.mode("overwrite").partitionBy("p_date").parquet(outDir)

  /** Read a [[writeDatePartitioned]] layout; date predicates on
    * `p_date` prune partitions at planning time.
    */
  def readDatePartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Write `df` clustered along `zCol` (a
    * [[graft.functions.ZOrder.zValue]] column): range-partition into
    * `numFiles` z-ranges, sort within each, drop the helper column,
    * write parquet. Because the z-curve keeps both source dimensions
    * locally contiguous, every row group's min/max stats form a tight
    * box in BOTH dimensions — a 2-D range predicate on the read side is
    * pushed to the parquet reader and skips row groups that a
    * single-column sort could only skip for one dimension.
    */
  def writeZOrdered(
      df: DataFrame, zCol: org.apache.spark.sql.Column,
      outDir: String, numFiles: Int): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
