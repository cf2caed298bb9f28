package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted per-day HLL sketch store — the pattern that answers
  * "distinct users over any date range" at 100 TB WITHOUT rescanning
  * raw data: each day's ingest reduces to one constant-size sketch row
  * (a Datasketches HLL register blob), appended to a tiny store table;
  * any range query unions the selected days' blobs
  * (`hll_union_agg`) — work proportional to |days|, never to rows.
  * Mergeability ([[Cardinality.hllUnionContract]]'s theorem) is what
  * makes the store SOUND: union-of-daily-sketches is the same summary
  * a direct sketch over the raw range would build.
  *
  * This is the cardinality twin of the MinHash band store
  * ([[Dedup.writeMinHashStore]]) and the IVF postings store
  * ([[IvfStore]]): persist the reduced structure once, let every later
  * question touch only the structure.
  */
object SketchStore {

  /** Build (overwrite) the store from a batch: one (day, sketch, n)
    * row per day of `tsCol`. The aggregate is the only data-sized
    * pass; the store itself is |days| rows. True overwrite: a leftover
    * warehouse location from a dead session (the catalog is per-JVM,
    * the filesystem isn't) is cleared instead of failing CREATE with
    * LOCATION_ALREADY_EXISTS.
    */
  def build(df: DataFrame, tsCol: String, valueCol: String, table: String,
      lgK: Int = 12): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    dailySketches(df, tsCol, valueCol, lgK)
      .write.mode("overwrite").saveAsTable(table)
  }

  /** Incremental ingest: sketch ONLY the new batch's days and append.
    * The store is never read, rewritten, or reshuffled — O(batch) per
    * ingest. (Days are assumed whole per ingest, the standard daily
    * cadence; re-ingesting a day appends a second sketch row for it,
    * which the union at query time absorbs harmlessly — HLL union is
    * idempotent on duplicate registers.)
    */
  def ingest(batch: DataFrame, tsCol: String, valueCol: String, table: String,
      lgK: Int = 12): Unit =
    dailySketches(batch, tsCol, valueCol, lgK)
      .write.mode("append").saveAsTable(table)

  private def dailySketches(df: DataFrame, tsCol: String, valueCol: String,
      lgK: Int): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Range distinct estimate from the store alone: filter days, union
    * blobs, estimate. One scan of a |days|-row table.
    */
  def rangeDistinct(spark: SparkSession, table: String,
      fromDay: String, toDay: String): DataFrame =
    spark.table(table)
      .filter(col("day") >= lit(fromDay) && col("day") <= lit(toDay))
      .agg(count(lit(1)).as("n_store_rows"),
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("est_distinct"))
}
