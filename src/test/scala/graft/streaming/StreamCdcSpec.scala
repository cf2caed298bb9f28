package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ops.Cdc
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Streaming CDC: a changelog STREAM folded into a maintained snapshot
  * with `foreachBatch` + [[graft.ops.Cdc.applyChangelog]] — the
  * continuous form of incremental corpus maintenance. Each micro-batch
  * applies as one batch changelog; the invariant under test is that the
  * folded result equals applying the full changelog once (which is
  * oracle-gated via `q_ext_cdc_apply`).
  */
class StreamCdcSpec extends SparkTestBase {
  import spark.implicits._

  test("per-batch changelog apply converges to the one-shot batch apply") {
    val dir = Files.createTempDirectory("graft-scdc").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("seq", LongType), StructField("op", StringType)))

    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val b1 = Seq((2L, 21L, 1L, "U"), (4L, 40L, 1L, "I"))
    val b2 = Seq((2L, 0L, 2L, "D"), (3L, 33L, 2L, "U"), (4L, 44L, 2L, "U"))

    // fold state lives as rows (test-scale); each batch re-lifts it
    var snapshot: Seq[(Long, Long)] = base.as[(Long, Long)].collect().toSeq
    def snapshotDf: DataFrame = snapshot.toDF("id", "v")

    b1.toDF("id", "v", "seq", "op").write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        snapshot = Cdc.applyChangelog(snapshotDf, batch, Seq("id"), "seq", "op")
          .as[(Long, Long)].collect().toSeq
      }
      .start()
    try {
      q.processAllAvailable()
      assert(snapshot.toMap === Map(1L -> 10L, 2L -> 21L, 3L -> 30L, 4L -> 40L))
      b2.toDF("id", "v", "seq", "op").write.parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()

    val folded = snapshot.toMap
    // one-shot apply of the concatenated changelog over the original base
    val oneShot = Cdc.applyChangelog(
        base, (b1 ++ b2).toDF("id", "v", "seq", "op"), Seq("id"), "seq", "op")
      .as[(Long, Long)].collect().toMap
    assert(folded === oneShot)
    assert(folded === Map(1L -> 10L, 3L -> 33L, 4L -> 44L))
  }
}
