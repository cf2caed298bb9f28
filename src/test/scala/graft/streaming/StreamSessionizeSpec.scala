package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.apache.spark.sql.types._

class StreamSessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("sessions close on gap across micro-batches; state carries within the gap") {
    val dir = Files.createTempDirectory("graft-sess").toString
    val schema = StructType(Seq(
      StructField("user", StringType), StructField("time", TimestampType)))

    // batch 1: u1 has two close events; u2 one event. ONE part file per
    // batch dir: with local[4] the default write splits rows across
    // part files, and the continuously-triggering file source can list
    // them across separate micro-batches in commit order — which
    // reorders events across the intra-batch sort and flakes the test.
    Seq(
      ("u1", Timestamp.valueOf("2024-01-01 00:00:00")),
      ("u1", Timestamp.valueOf("2024-01-01 00:05:00")),
      ("u2", Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("user", "time").repartition(1).write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      .as[StreamSessionize.Event]
    // idleTimeout = None: a pending processing-time timeout would keep
    // the synchronous test driver scheduling batches
    val q = StreamSessionize.sessionize(stream, gapMillis = 30 * 60 * 1000L,
        idleTimeout = None).toDF()
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      // nothing closed yet: all sessions still open
      assert(spark.sql("SELECT * FROM sessions").count() === 0)

      // batch 2: u1 within the gap (extends), then far past it (closes
      // the first session and opens a new one)
      Seq(
        ("u1", Timestamp.valueOf("2024-01-01 00:20:00")),
        ("u1", Timestamp.valueOf("2024-01-01 02:00:00"))
      ).toDF("user", "time").repartition(1).write.parquet(s"$dir/b2")
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT user, start, end, nEvents, closedByTimeout FROM sessions").collect()
      assert(rows.length === 1)
      val s = rows(0)
      assert(s.getString(0) === "u1")
      assert(s.getTimestamp(1) === Timestamp.valueOf("2024-01-01 00:00:00"))
      assert(s.getTimestamp(2) === Timestamp.valueOf("2024-01-01 00:20:00")) // extended by batch 2
      assert(s.getLong(3) === 3L) // two from b1 + one from b2, same session
      assert(!s.getBoolean(4))
    } finally q.stop()
  }

  test("timeout branch: idle user's session closes and state evicts (TestGroupState)") {
    val st = TestGroupState.create[StreamSessionize.SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(
        StreamSessionize.SessionState(1000L, 61000L, 4L)),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 100000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out = StreamSessionize.update(gapMillis = 1800000L, idleTimeout = Some("30 minutes"))(
      "u9", Iterator.empty, st).toSeq
    assert(out.length === 1)
    assert(out.head.closedByTimeout)
    assert(out.head.nEvents === 4L)
    assert(out.head.end.getTime === 61000L)
    assert(st.isRemoved) // state evicted, bounded by active users
  }
}
