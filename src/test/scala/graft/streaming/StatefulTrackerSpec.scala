package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.types._

class StatefulTrackerSpec extends SparkTestBase {
  import spark.implicits._

  test("per-station state survives micro-batches: counts and max gap accumulate") {
    val dir = Files.createTempDirectory("graft-state").toString
    val schema = StructType(Seq(
      StructField("station", StringType), StructField("time", TimestampType)))

    Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00")),
      ("A", Timestamp.valueOf("2024-01-01 00:01:00")),
      ("B", Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("station", "time").write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      .as[StatefulTracker.Obs]
    val q = StatefulTracker.track(stream).toDF()
      .writeStream.outputMode("append").format("memory").queryName("tracker").start()
    try {
      q.processAllAvailable()
      // batch 2: A returns after a 10-minute gap
      Seq(("A", Timestamp.valueOf("2024-01-01 00:11:00")))
        .toDF("station", "time").write.parquet(s"$dir/b2")
      q.processAllAvailable()

      val last = spark.sql(
        "SELECT n, maxGapMillis FROM tracker WHERE station='A' ORDER BY n DESC LIMIT 1").head()
      assert(last.getLong(0) === 3L)           // count carried across batches
      assert(last.getLong(1) === 600000L)      // 10-min gap measured across batches
      val b = spark.sql(
        "SELECT n FROM tracker WHERE station='B' ORDER BY n DESC LIMIT 1").head()
      assert(b.getLong(0) === 1L)
    } finally q.stop()
  }
}
