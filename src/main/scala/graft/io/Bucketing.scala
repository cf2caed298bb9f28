package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location (builder scale checklist: "repartition/
  * bucketing for co-located joins").
  *
  * A fact table joined repeatedly on the same key (orders ⋈ lineitem on
  * orderkey; documents ⋈ signatures on doc_id) should be written
  * bucketed: both sides hash-partitioned into the same bucket count at
  * write time, so every subsequent join/aggregation on that key runs
  * with ZERO shuffle — the scan itself reports the partitioning and
  * Catalyst drops the Exchange. At 100 TB that converts the dominant
  * repeated cost (a full shuffle per join) into a one-time write cost.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted parquet table in the session
    * catalog. `buckets` should be sized so each bucket is O(shuffle
    * partition target) at full scale.
    *
    * Idempotent across JVMs: the in-memory catalog forgets tables on
    * restart while the warehouse directory persists, so a bare
    * `saveAsTable` would refuse the stale location — drop both first.
    */
  /** Append to an existing bucketed table (create it if absent) —
    * incremental stores grow per ingest; each append adds one file per
    * bucket per job, preserving the bucket spec so downstream
    * co-located joins keep their zero-Exchange property. Interleave
    * with [[graft.io.Layout.compact]]-style maintenance when the
    * per-bucket file count accretes.
    */
  def appendBucketed(
      df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) writeBucketed(df, table, keys, buckets)
    else df.write
      .mode("append")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .saveAsTable(table)
  }

  def writeBucketed(
      df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .saveAsTable(table)
  }
}
