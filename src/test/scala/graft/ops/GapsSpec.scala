package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GapsSpec extends SparkTestBase {

  import spark.implicits._

  private def series(rows: (String, Long, Long)*) =
    rows.toDF("k", "us", "id").withColumn("ts", timestamp_micros(col("us")))

  test("reports only gaps strictly above the threshold, per key") {
    val df = series(
      ("a", 0L, 1L), ("a", 10_000_000L, 2L), ("a", 3_700_000_000L, 3L),
      ("b", 0L, 4L), ("b", 3_600_000_000L, 5L)) // exactly 3600 s: NOT a gap
    val out = Gaps.detect(df, "k", "ts", "id", 3600L)
      .select("k", "gap_us", "gap_seconds").collect().map(_.toSeq)
    assert(out.toSeq === Seq(Seq("a", 3_690_000_000L, 3690L)))
  }

  test("keys never interleave: a large cross-key delta is not a gap") {
    val df = series(("a", 0L, 1L), ("b", 100_000_000_000L, 2L))
    assert(Gaps.detect(df, "k", "ts", "id", 3600L).count() === 0L)
  }

  test("tie-break column makes same-timestamp ordering total") {
    val df = series(("a", 0L, 2L), ("a", 0L, 1L), ("a", 4_000_000_000L, 3L))
    val out = Gaps.detect(df, "k", "ts", "id", 3600L)
      .select("gap_us").as[Long].collect().toSeq
    assert(out === Seq(4_000_000_000L))
  }

  test("positive threshold required") {
    intercept[IllegalArgumentException](
      Gaps.detect(series(("a", 0L, 1L)), "k", "ts", "id", 0L))
  }
}
