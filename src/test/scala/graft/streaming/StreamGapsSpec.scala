package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.types._

class StreamGapsSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("key", StringType),
    StructField("tsUs", LongType),
    StructField("id", LongType)))

  test("gap spanning a micro-batch boundary is detected from carried state") {
    val dir = Files.createTempDirectory("graft-stgaps").toString
    Seq(("a", 0L, 1L), ("a", 10_000_000L, 2L))
      .toDF("key", "tsUs", "id").write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      .as[StreamGaps.GapObs]
    val q = StreamGaps.gaps(stream, 3600L).toDF()
      .writeStream.outputMode("append").format("memory").queryName("stgaps").start()
    try {
      q.processAllAvailable()
      assert(spark.table("stgaps").count() === 0L) // 10 s apart: no gap yet
      // batch 2: key a returns 2 h after its batch-1 last observation
      Seq(("a", 7_210_000_000L, 3L), ("b", 0L, 4L))
        .toDF("key", "tsUs", "id").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val rows = spark.table("stgaps")
        .select("key", "gap_start_us", "gap_end_us", "gap_us")
        .collect().map(_.toSeq)
      assert(rows.toSeq === Seq(Seq("a", 10_000_000L, 7_210_000_000L, 7_200_000_000L)))
    } finally q.stop()
  }

  test("within one batch, out-of-order arrivals sort before gap scanning") {
    val dir = Files.createTempDirectory("graft-stgaps2").toString
    // arrival order scrambled; sorted order 0 -> 4000s -> 4010s has ONE gap
    Seq(("a", 4_010_000_000L, 3L), ("a", 0L, 1L), ("a", 4_000_000_000L, 2L))
      .toDF("key", "tsUs", "id").write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      .as[StreamGaps.GapObs]
    val q = StreamGaps.gaps(stream, 3600L).toDF()
      .writeStream.outputMode("append").format("memory").queryName("stgaps2").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("stgaps2").select("gap_us").as[Long].collect().toSeq
      assert(rows === Seq(4_000_000_000L))
    } finally q.stop()
  }

  test("positive threshold required") {
    intercept[IllegalArgumentException](
      StreamGaps.gaps(spark.emptyDataset[StreamGaps.GapObs], 0L))
  }
}
