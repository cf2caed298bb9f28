package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** Streaming 10-min resample driven synchronously: parquet batches in a
  * watched directory -> memory sink (guide: processAllAvailable).
  */
class StreamResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming tumbling mean matches the batch resample semantics") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val schema = StructType(Seq(
      StructField("time", TimestampType), StructField("v", DoubleType)))

    // first micro-batch
    Seq(
      (Timestamp.valueOf("2024-01-01 00:01:00"), 2.0),
      (Timestamp.valueOf("2024-01-01 00:05:00"), 4.0),
      (Timestamp.valueOf("2024-01-01 01:00:00"), 9.0) // advances watermark past bin 0
    ).toDF("time", "v").write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(schema).option("path", s"$dir/*")
      .format("parquet").load()
    val agg = StreamResample.tumblingMean(stream, "time", 10, Seq("v"),
      watermark = "20 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("resampled").start()
    try {
      q.processAllAvailable()
      // second micro-batch far ahead closes earlier windows
      Seq((Timestamp.valueOf("2024-01-01 02:00:00"), 1.0))
        .toDF("time", "v").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT time, v, n_rows FROM resampled ORDER BY time").collect()
      assert(rows.nonEmpty)
      assert(rows(0).getTimestamp(0) === Timestamp.valueOf("2024-01-01 00:00:00"))
      assert(rows(0).getDouble(1) === 3.0) // (2+4)/2, left-closed bin
      assert(rows(0).getLong(2) === 2L)
    } finally q.stop()
  }
}
