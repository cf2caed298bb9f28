package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** Streaming near-dup ingest: batch N+1 must dedup against everything
  * batch N kept (memory lives in the persisted store, not in Spark
  * streaming state), and within a batch the cluster canonical (min id)
  * survives.
  */
class StreamNearDupSpec extends SparkTestBase {
  import spark.implicits._

  test("later batches drop near-dups of earlier ingests; novel docs accrue to the store") {
    val root = Files.createTempDirectory("graft-snd").toString
    val src = s"$root/src"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    // drop catalog entries AND the persisted warehouse dirs — the store
    // deliberately survives JVM restarts (appendBucketed re-registers
    // it), so a fresh-store test must clear both layers
    Seq("t_snd_store_bands", "t_snd_store_sigs").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }

    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet village roofs"
    val baseTweak = base.replace("village", "mountain")
    val other = "solar radiation measurements aggregate into ten minute buckets for every station in the network"
    val otherTweak = other.replace("network", "archive")
    val novel = "completely different subject matter concerning typed dataset encoders and catalyst expression trees"

    // batch 1: a near-dup pair (4,2) -> canonical min id 2 kept; plus 1.
    // ONE part file per logical batch (coalesce(1)): the local Seq would
    // otherwise split into several part files, and maxFilesPerTrigger=1
    // would slice the logical batch into micro-batches along a
    // nondeterministic partitioning — putting (2,4) in different batches
    // makes the store probe legitimately keep whichever arrived first.
    Seq((2L, base), (4L, baseTweak), (1L, other)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b1")
    val schema = spark.read.parquet(s"$src/b1").schema
    def run(): Unit = {
      val q = StreamNearDup.ingest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(s"$src/*"),
        "doc_id", "text", "t_snd_store", out, ckpt,
        shingleN = 2, minJaccard = 0.5, minEst = 0.4,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    run()
    val kept1 = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(kept1.toSeq === Seq(1L, 2L))

    // batch 2: near-dups of BOTH earlier keeps (dropped via the store,
    // not via streaming state) + one genuinely novel doc (kept)
    Seq((10L, base), (11L, otherTweak), (12L, novel)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b2")
    run() // AvailableNow restart picks up the new file via the checkpoint
    val kept2 = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq === Seq(1L, 2L, 12L))

    // batch 3: near-dup of the doc that arrived VIA THE STREAM in batch 2
    Seq((20L, novel.replace("trees", "nodes"))).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b3")
    run()
    val kept3 = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(kept3.toSeq === Seq(1L, 2L, 12L))

    // the store accreted exactly the kept docs' signatures
    val storeIds = spark.table("t_snd_store_sigs").select("id").as[Long].collect().sorted
    assert(storeIds.toSeq === Seq(1L, 2L, 12L))
  }
}
