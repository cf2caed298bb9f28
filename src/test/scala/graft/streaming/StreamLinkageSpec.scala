package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming record linkage: batch N+1 must link against everything
  * ingested in batches 1..N via the persisted block-keyed store (no
  * Spark streaming state), and within-batch pairs classify exactly as
  * the batch operator does.
  */
class StreamLinkageSpec extends SparkTestBase {
  import spark.implicits._

  private def scores(pairs: DataFrame) = Seq(
    when(col("name_a") === col("name_b"), 6L).otherwise(-3L),
    when(col("city_a") === col("city_b"), 4L).otherwise(-2L))

  test("cross-batch pairs resolve via the store; within-batch pairs match the batch operator") {
    val root = Files.createTempDirectory("graft-slk").toString
    val src = s"$root/src"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    spark.sql("DROP TABLE IF EXISTS `t_slk_store`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "t_slk_store")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)

    // block = first letter of name
    def rec(id: Long, name: String, city: String) =
      (id, name, city, name.substring(0, 1))

    // batch 1: (1, 2) same block, full match; 3 in another block
    Seq(rec(1L, "alice", "bandung"), rec(2L, "alice", "bandung"),
      rec(3L, "budi", "jakarta"))
      .toDF("rid", "name", "city", "block")
      .coalesce(1).write.parquet(s"$src/b1")
    val schema = spark.read.parquet(s"$src/b1").schema
    def run(): Unit = {
      val q = StreamLinkage.ingest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$src/*"),
        "rid", Seq("block"), scores,
        matchMin = 10L, possibleMin = 1L,
        storeName = "t_slk_store", outPath = out, checkpoint = ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    run()
    val p1 = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(p1 === Set((1L, 2L, 10L, "match")))

    // batch 2: 10 matches batch-1's record 3 ACROSS the store; 11 is a
    // within-batch partial match with 10 (same block, different city)
    Seq(rec(10L, "budi", "jakarta"), rec(11L, "budi", "surabaya"))
      .toDF("rid", "name", "city", "block")
      .coalesce(1).write.parquet(s"$src/b2")
    run()
    val p2 = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(p2 === Set(
      (1L, 2L, 10L, "match"),
      (3L, 10L, 10L, "match"), // cross-store, oriented low id first
      (3L, 11L, 4L, "possible"), // cross-store partial
      (10L, 11L, 4L, "possible"))) // within batch 2

    // the store accreted every ingested record
    assert(spark.table("t_slk_store").count() === 5L)
  }

  test("cross-batch fan-out is bounded by maxBlock against a hot store block") {
    val root = Files.createTempDirectory("graft-slk-hot").toString
    val src = s"$root/src"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    spark.sql("DROP TABLE IF EXISTS `t_slk_hot_store`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "t_slk_hot_store")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)

    def run(): Unit = {
      val schema = spark.read.parquet(s"$src/b1").schema
      val q = StreamLinkage.ingest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$src/*"),
        "rid", Seq("block"), scores,
        matchMin = 10L, possibleMin = -100L,
        storeName = "t_slk_hot_store", outPath = out, checkpoint = ckpt,
        maxBlock = 3, trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    // batch 1: a HOT block — 8 store rows in block "a", far over the cap
    (1L to 8L).map(i => (i, s"name$i", "city", "a"))
      .toDF("rid", "name", "city", "block")
      .coalesce(1).write.parquet(s"$src/b1")
    run()
    // batch 2: one probe record against the accreted hot block
    Seq((100L, "probe", "city", "a"))
      .toDF("rid", "name", "city", "block")
      .coalesce(1).write.parquet(s"$src/b2")
    run()
    val crossPairs = spark.read.parquet(out)
      .filter(col("id_a") === 100L || col("id_b") === 100L)
      .count()
    // uncapped the probe would pair with all 8 store rows; the capped
    // store exposes only the maxBlock lowest-id members per block
    assert(crossPairs === 3L,
      s"hot-block fan-out must be capped at maxBlock=3, got $crossPairs")
  }
}
