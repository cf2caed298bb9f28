package graft.ext

import java.sql.Timestamp

import graft.SparkTestBase

class HistogramStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(day: Int, v: Double) =
    (Timestamp.valueOf(f"2024-03-$day%02d 10:00:00"), v)

  test("build + ingest + range quantiles: exact targets on a uniform grid") {
    val store = "g_test_hist_store"
    spark.sql(s"DROP TABLE IF EXISTS `$store`")
    // day 1: values 1..100, day 2: 101..200; day 3 ingested: 201..300.
    val base = ((1 to 100).map(i => ev(1, i.toDouble)) ++
      (101 to 200).map(i => ev(2, i.toDouble))).toDF("ts", "v")
    val batch = (201 to 300).map(i => ev(3, i.toDouble)).toDF("ts", "v")
    HistogramStore.build(base, "ts", "v", store, 0.0, 400.0, bins = 40)
    HistogramStore.ingest(batch, "ts", "v", store, 0.0, 400.0, bins = 40)
    // store is tiny: at most bins rows per day
    assert(spark.table(store).count() <= 3 * 40)

    val out = HistogramStore.rangeQuantiles(spark, store,
        "2024-03-01", "2024-03-03", Seq(50, 90), 0.0, 400.0, bins = 40)
      .collect().map(r => r.getAs[Int]("q_pct") -> r).toMap
    assert(out(50).getAs[Long]("n") === 300L)
    // bin width is 10: every estimate must sit within one width of the
    // exact order statistic (p50 -> 150, p90 -> 270)
    assert(math.abs(out(50).getAs[Double]("est") - 150.0) <= 10.0)
    assert(math.abs(out(90).getAs[Double]("est") - 270.0) <= 10.0)
  }

  test("range filter excludes out-of-range days; merge is additive") {
    val store = "g_test_hist_store2"
    spark.sql(s"DROP TABLE IF EXISTS `$store`")
    val df = ((1 to 50).map(i => ev(1, 10.0)) ++
      (1 to 50).map(i => ev(9, 1000.0))).toDF("ts", "v")
    HistogramStore.build(df, "ts", "v", store, 0.0, 100.0, bins = 10)
    val r = HistogramStore.rangeQuantiles(spark, store,
        "2024-03-01", "2024-03-05", Seq(50), 0.0, 100.0, bins = 10)
      .collect().head
    // day 9's clamped top-bin values are invisible to the range
    assert(r.getAs[Long]("n") === 50L)
    assert(r.getAs[Double]("est") >= 10.0 && r.getAs[Double]("est") < 20.0)
  }

  test("q=100 targets the maximum; q=1 targets the minimum's bin") {
    val store = "g_test_hist_store4"
    spark.sql(s"DROP TABLE IF EXISTS `$store`")
    val df = (1 to 100).map(i => ev(1, i.toDouble)).toDF("ts", "v")
    HistogramStore.build(df, "ts", "v", store, 0.0, 100.0, bins = 10)
    val out = HistogramStore.rangeQuantiles(spark, store,
        "2024-03-01", "2024-03-01", Seq(1, 100), 0.0, 100.0, bins = 10)
      .collect().map(r => r.getAs[Int]("q_pct") -> r.getAs[Double]("est"))
      .toMap
    // p100 -> rank 100 -> last bin [90,100); p1 -> rank 1 -> first bin
    assert(out(100) > 90.0 && out(100) <= 100.0)
    assert(out(1) >= 0.0 && out(1) <= 10.0)
  }

  test("re-ingesting a day adds rows the additive merge absorbs exactly") {
    val store = "g_test_hist_store3"
    spark.sql(s"DROP TABLE IF EXISTS `$store`")
    val df = (1 to 100).map(i => ev(1, i.toDouble)).toDF("ts", "v")
    HistogramStore.build(df, "ts", "v", store, 0.0, 200.0, bins = 20)
    HistogramStore.ingest(df, "ts", "v", store, 0.0, 200.0, bins = 20)
    val r = HistogramStore.rangeQuantiles(spark, store,
        "2024-03-01", "2024-03-01", Seq(50), 0.0, 200.0, bins = 20)
      .collect().head
    assert(r.getAs[Long]("n") === 200L) // doubled counts, same median bin
    assert(math.abs(r.getAs[Double]("est") - 50.0) <= 10.0)
  }
}
