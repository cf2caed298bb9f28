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
}
