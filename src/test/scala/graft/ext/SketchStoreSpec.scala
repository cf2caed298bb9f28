package graft.ext

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(day: Int, user: Long) =
    (Timestamp.valueOf(f"2024-03-$day%02d 10:00:00"), user)

  test("build + ingest: one sketch row per day; range union equals direct sketch") {
    val store = "g_test_hll_store"
    spark.sql(s"DROP TABLE IF EXISTS `$store`")
    // days 1-2: users 1..40 (overlapping); day 3 ingested later: 30..60.
    val base = ((1L to 30L).map(ev(1, _)) ++ (11L to 40L).map(ev(2, _)))
      .toDF("ts", "user_id")
    val batch = (30L to 60L).map(ev(3, _)).toDF("ts", "user_id")
    SketchStore.build(base, "ts", "user_id", store)
    assert(spark.table(store).count() === 2)
    SketchStore.ingest(batch, "ts", "user_id", store)
    assert(spark.table(store).count() === 3)

    val r = SketchStore.rangeDistinct(spark, store, "2024-03-01", "2024-03-03")
      .collect().head
    assert(r.getLong(0) === 3)
    val all = base.unionByName(batch)
    val direct = all.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .collect().head.getLong(0)
    assert(r.getLong(1) === direct,
      "union of per-day sketches must equal the direct sketch estimate")
    // tiny cardinality: the sketch is still exact here
    assert(r.getLong(1) === 60)
  }

  test("range filter touches only the selected days") {
    val store = "g_test_hll_store2"
    spark.sql(s"DROP TABLE IF EXISTS `$store`")
    val df = ((1L to 10L).map(ev(1, _)) ++ (1L to 10L).map(ev(5, _)) ++
      (100L to 120L).map(ev(9, _))).toDF("ts", "user_id")
    SketchStore.build(df, "ts", "user_id", store)
    val r = SketchStore.rangeDistinct(spark, store, "2024-03-01", "2024-03-05")
      .collect().head
    assert(r.getLong(0) === 2)   // two store rows in range
    assert(r.getLong(1) === 10)  // day-9 users invisible to the range
  }
}
