package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.types._

class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming dedup drops same-content docs within the watermark") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("doc_id", LongType),
      StructField("text", StringType)))

    Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "alpha beta"),
      (Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "alpha beta"), // dup content
      (Timestamp.valueOf("2024-01-01 00:02:00"), 3L, "gamma delta")
    ).toDF("ts", "doc_id", "text").write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val deduped = StreamDedup.dropDuplicateDocs(stream, "ts", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM sdedup ORDER BY doc_id")
        .as[Long].collect().toSeq
      assert(ids === Seq(1L, 3L)) // doc 2 dropped as duplicate content
    } finally q.stop()
  }
}
