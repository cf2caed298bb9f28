package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.types._

class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("intervalJoin matches within [min, max] lag on the equi-key only") {
    val dir = Files.createTempDirectory("graft-sjoin").toString
    val leftSchema = StructType(Seq(
      StructField("click_id", LongType), StructField("user_id", LongType),
      StructField("click_ts", TimestampType)))
    val rightSchema = StructType(Seq(
      StructField("purchase_id", LongType), StructField("user_id", LongType),
      StructField("purchase_ts", TimestampType)))

    Seq(
      (1L, 10L, ts(1000)),  // matches purchase at 1300 (lag 300)
      (2L, 10L, ts(5000)),  // no purchase within 600s
      (3L, 20L, ts(1000))   // user 20: purchase at 1100
    ).toDF("click_id", "user_id", "click_ts").write.parquet(s"$dir/left")
    Seq(
      (100L, 10L, ts(1300)),
      (101L, 10L, ts(7000)), // 2000s after click 2 — out of range
      (102L, 20L, ts(1100)),
      (103L, 20L, ts(999))   // before the click — out of range
    ).toDF("purchase_id", "user_id", "purchase_ts").write.parquet(s"$dir/right")

    val l = spark.readStream.schema(leftSchema).parquet(s"$dir/left")
    val r = spark.readStream.schema(rightSchema).parquet(s"$dir/right")
    val q = StreamJoin.intervalJoin(l, r, Seq("user_id"),
        "click_ts", "purchase_ts", 0L, 600L, "1 hour")
      .select($"click_id", $"purchase_id")
      .writeStream.outputMode("append").format("memory").queryName("sjoin").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sjoin").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      assert(got === Set((1L, 100L), (3L, 102L)))
    } finally q.stop()
  }

  test("intervalJoin requires a key and a sane lag window") {
    val df = Seq((1L, ts(0))).toDF("user_id", "t")
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(df, df, Nil, "t", "t", 0L, 1L, "1 hour")
    }
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(df, df, Seq("user_id"), "t", "t", 5L, 1L, "1 hour")
    }
  }
}
