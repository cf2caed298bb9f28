package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join with zero shuffle (no Exchange in the plan)") {
    val facts = (1 to 1000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
    val dims = (0 until 100).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
        .groupBy("k").agg(sum($"v").as("s"), first($"name").as("name"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() === 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("appendBucketed re-registers (never deletes) a store that outlived the catalog") {
    import org.apache.hadoop.fs.Path
    val df = (0L until 20L).map(i => (i, i % 4)).toDF("id", "k")
    Bucketing.writeBucketed(df, "b_rereg", Seq("id"), 4)
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"), "b_rereg")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new Path(wh.getParent, "b_rereg_bak")
    try {
      // simulate a JVM restart with the default in-memory catalog: the
      // warehouse dir survives, the catalog entry does not (the rename
      // shields the files from the managed-table drop)
      fs.rename(wh, bak)
      spark.sql("DROP TABLE b_rereg")
      fs.rename(bak, wh)
      Bucketing.appendBucketed(
        (20L until 30L).map(i => (i, i % 4)).toDF("id", "k"), "b_rereg", Seq("id"), 4)
      // history preserved + batch appended — NOT replaced by the batch
      assert(spark.table("b_rereg").count() === 30)
      // and the bucket spec survived re-registration
      val desc = spark.sql("DESCRIBE EXTENDED b_rereg")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("Num Buckets") && desc.contains("4"), desc)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_rereg")
      if (fs.exists(bak)) fs.delete(bak, true)
    }
  }
}
