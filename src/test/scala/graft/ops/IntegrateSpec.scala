package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntegrateSpec extends SparkTestBase {

  import spark.implicits._

  private def series(rows: (String, Long, Long, Double)*) =
    rows.toDF("k", "us", "id", "v").withColumn("ts", timestamp_micros(col("us")))

  test("trapezoid matches the hand-computed integral per key") {
    // key a: (0s, 2.0) -> (10s, 4.0) -> (20s, 0.0)
    //   = (2+4)/2*10 + (4+0)/2*10 = 30 + 20 = 50
    val df = series(
      ("a", 0L, 1L, 2.0), ("a", 10_000_000L, 2L, 4.0), ("a", 20_000_000L, 3L, 0.0),
      ("b", 0L, 4L, 1.0), ("b", 5_000_000L, 5L, 1.0))
    val got = Integrate.trapezoid(df, "k", "ts", "id", "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got("a") === ((50.0, 2L)))
    assert(got("b") === ((5.0, 1L)))
  }

  test("a singleton key integrates to zero over zero intervals") {
    val got = Integrate.trapezoid(series(("solo", 0L, 1L, 99.0)), "k", "ts", "id", "v")
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === Seq((0.0, 0L)))
  }

  test("result is invariant to input partitioning (decimal term sums)") {
    val df = series((1 to 200).map(i =>
      ("a", i.toLong * 1_000_000L, i.toLong, math.sin(i / 7.0) * 100)): _*)
    val one = Integrate.trapezoid(df, "k", "ts", "id", "v").head().getDouble(1)
    val many = Integrate.trapezoid(df.repartition(17), "k", "ts", "id", "v")
      .head().getDouble(1)
    assert(one === many)
  }

  test("timeWeightedMean: integral over span, not the sample mean") {
    // 2.0 held for 10s then a single late 4.0 sample at 20s:
    // integral = (2+2)/2*10 + (2+4)/2*10 = 50, span 20 -> TWA 2.5,
    // while the naive sample mean is (2+2+4)/3 ≈ 2.67.
    val df = series(
      ("a", 0L, 1L, 2.0), ("a", 10_000_000L, 2L, 2.0),
      ("a", 20_000_000L, 3L, 4.0))
    val r = Integrate.timeWeightedMean(df, "k", "ts", "id", "v")
      .collect().head
    assert(r.getAs[Long]("n_samples") === 3L)
    assert(r.getAs[Double]("span_seconds") === 20.0)
    assert(r.getAs[Double]("twa") === 2.5)
  }

  test("timeWeightedMean: zero span reports null instead of dividing") {
    val df = series(("a", 5_000_000L, 1L, 7.0))
    val r = Integrate.timeWeightedMean(df, "k", "ts", "id", "v")
      .collect().head
    assert(r.getAs[Double]("span_seconds") === 0.0)
    assert(r.isNullAt(r.fieldIndex("twa")))
  }
}
