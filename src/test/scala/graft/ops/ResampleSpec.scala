package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins pandas `resample('10min').mean()` semantics (SURVEY §2.4 A1):
  * left-closed/left-labeled bins, null-skipping mean, densified gaps.
  */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling mean is left-closed / left-labeled") {
    // 10:00:00 and 10:09:59 belong to the 10:00 bin; 10:10:00 starts the next.
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 1.0),
      (ts("2024-01-01 10:09:59"), 3.0),
      (ts("2024-01-01 10:10:00"), 10.0)
    ).toDF("time", "v")
    val out = Resample.tumblingMean(df, "time", 10)
      .orderBy("time").collect()
    assert(out.length === 2)
    assert(out(0).getTimestamp(0) === ts("2024-01-01 10:00:00"))
    assert(out(0).getDouble(1) === 2.0)
    assert(out(1).getTimestamp(0) === ts("2024-01-01 10:10:00"))
    assert(out(1).getDouble(1) === 10.0)
  }

  test("mean skips nulls like pandas mean skips NaN") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), Some(4.0)),
      (ts("2024-01-01 00:01:00"), None),
      (ts("2024-01-01 00:02:00"), Some(8.0))
    ).toDF("time", "v")
    val out = Resample.tumblingMean(df, "time", 10).collect()
    assert(out.length === 1)
    assert(out(0).getDouble(1) === 6.0)
  }

  test("dynamic numeric projection picks only numeric columns") {
    val df = Seq((ts("2024-01-01 00:00:00"), 1.0, "x", 2L))
      .toDF("time", "v", "s", "k")
    assert(Resample.numericColumns(df).toSet === Set("v", "k"))
    val out = Resample.tumblingMean(df, "time", 10)
    assert(out.columns.toSet === Set("time", "v", "k", "n_rows"))
  }

  test("densify emits empty bins across the full span") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), 1.0),
      // 00:10 bin missing entirely
      (ts("2024-01-01 00:20:00"), 5.0)
    ).toDF("time", "v")
    val bucketed = df
      .groupBy(TimeOps.bucketStartEpoch(col("time"), 600).as("bucket"))
      .agg(avg("v").as("v"))
    val dense = Resample.densify(bucketed, "bucket", 600)
      .orderBy("bucket").collect()
    assert(dense.length === 3)
    assert(dense(1).isNullAt(1)) // the gap bin surfaces as null mean
  }

  test("interpolateLinear: proportional fill, edges stay null, keyed series independent") {
    val dense = Seq(
      ("a", 0L, Some(1.0)),
      ("a", 600L, None),       // one-step gap -> midpoint
      ("a", 1200L, Some(5.0)),
      ("a", 1800L, None),      // two-step gap, first third
      ("a", 2400L, None),      // two-step gap, second third
      ("a", 3000L, Some(8.0)),
      ("a", 3600L, None),      // trailing gap -> stays null
      ("b", 0L, None),         // leading gap -> stays null
      ("b", 600L, Some(10.0))
    ).toDF("key", "bucket", "v")
    val got = Resample.interpolateLinear(dense, "bucket", "v", keys = Seq("key"))
      .orderBy("key", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got(1) === (("a", 600L, Some(3.0))))
    assert(got(3) === (("a", 1800L, Some(6.0))))
    assert(got(4) === (("a", 2400L, Some(7.0))))
    assert(got(6)._3 === None) // trailing
    assert(got(7)._3 === None) // leading, other key unaffected by 'a'
    assert(got(8) === (("b", 600L, Some(10.0))))
  }

  test("resample of a union equals resample over concatenated input") {
    val a = Seq((ts("2024-01-01 00:00:00"), 2.0)).toDF("time", "v")
    val b = Seq((ts("2024-01-01 00:01:00"), 4.0)).toDF("time", "v")
    val together = Resample.tumblingMean(a.unionByName(b), "time", 10).collect()
    assert(together.length === 1 && together(0).getDouble(1) === 3.0)
  }
}
