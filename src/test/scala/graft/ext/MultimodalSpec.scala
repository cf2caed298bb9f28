package graft.ext

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("asMediaTable builds (id, binary payload, typed metadata)") {
    val df = Seq((1L, "hello")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(df, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName === "binary")
    val row = media.collect()(0)
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") === "hello")
    assert(row.getStruct(2).getAs[String]("content_type") === "text/plain")
  }

  test("extractFeatures: partition-wise stub decode is deterministic") {
    val media = Seq(
      Multimodal.MediaRow(1L, "abc".getBytes("UTF-8"), "text/plain"),
      Multimodal.MediaRow(2L, "abc".getBytes("UTF-8"), "text/plain"),
      Multimodal.MediaRow(3L, "xyz".getBytes("UTF-8"), "text/plain")
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    assert(feats(0).checksum === feats(1).checksum)
    assert(feats(0).checksum !== feats(2).checksum)
    assert(feats(0).byteLength === 3)
    assert(feats(0).width >= 16 && feats(0).height >= 16)
  }

  test("binaryFile source reads payload bytes with provenance") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("img_001.bin"), Array[Byte](1, 2, 3, 4))
    val df = Multimodal.readBinaryFiles(spark, s"$dir/*.bin")
    val row = df.select("path", "length", "content").collect()(0)
    assert(row.getAs[String]("path").endsWith("img_001.bin"))
    assert(row.getAs[Long]("length") === 4L)
    assert(row.getAs[Array[Byte]]("content").toSeq === Seq[Byte](1, 2, 3, 4))
  }
}
