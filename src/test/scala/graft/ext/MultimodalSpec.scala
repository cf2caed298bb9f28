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

  // minimal synthesized containers: headers are real, pixel data absent
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    out.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    out.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.array()
  }
  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
    out.array()
  }
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 8 + 11)
    out.put(Array[Byte](0xFF.toByte, 0xD8.toByte))                      // SOI
    out.put(Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 6)).putInt(0)      // APP0, len 6
    out.put(Array[Byte](0xFF.toByte, 0xC0.toByte, 0, 9, 8))             // SOF0, len 9
    out.putShort(h.toShort).putShort(w.toShort).put(1.toByte)
    out.array()
  }

  test("JPEG walk: fill bytes before markers and standalone RST/TEM markers") {
    // SOI, fill byte, APP0, TEM (standalone), SOF0 — all spec-legal
    val out = java.nio.ByteBuffer.allocate(2 + 1 + 8 + 2 + 11)
    out.put(Array[Byte](0xFF.toByte, 0xD8.toByte))
    out.put(0xFF.toByte)                                           // fill byte
    out.put(Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 6)).putInt(0) // APP0
    out.put(Array[Byte](0xFF.toByte, 0x01.toByte))                 // TEM, no length
    out.put(Array[Byte](0xFF.toByte, 0xC0.toByte, 0, 9, 8))        // SOF0
    out.putShort(600.toShort).putShort(800.toShort).put(1.toByte)
    assert(Multimodal.imageHeaderDims(out.array()) === Some(("jpeg", 800, 600)))
    // EOI before any frame header -> unparseable, not garbage
    assert(Multimodal.imageHeaderDims(
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)) === None)
  }

  test("image header decode: real dimensions from PNG/GIF/JPEG byte headers") {
    val media = Seq(
      Multimodal.MediaRow(1L, pngBytes(640, 480), "application/octet-stream"),
      Multimodal.MediaRow(2L, gifBytes(320, 200), "application/octet-stream"),
      Multimodal.MediaRow(3L, jpegBytes(1920, 1080), "application/octet-stream"),
      Multimodal.MediaRow(4L, "not an image".getBytes("UTF-8"), "text/plain")
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    assert((feats(0).mediaType, feats(0).width, feats(0).height) === (("image/png", 640, 480)))
    assert((feats(1).mediaType, feats(1).width, feats(1).height) === (("image/gif", 320, 200)))
    assert((feats(2).mediaType, feats(2).width, feats(2).height) === (("image/jpeg", 1920, 1080)))
    assert(feats(3).mediaType === "text/plain") // falls back to the stub
  }

  test("pngDims: codegen'd expression path extracts PNG size, null for non-PNG") {
    val df = Seq(
      (1L, pngBytes(800, 600)),
      (2L, "plain bytes".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val got = df.select($"id", Multimodal.pngDims($"payload").as("dims"))
      .orderBy("id").collect()
    assert(got(0).getStruct(1).getInt(0) === 800)
    assert(got(0).getStruct(1).getInt(1) === 600)
    assert(got(1).getStruct(1).isNullAt(0))
  }

  test("AV container headers: WAV/FLAC/MP4 byte layouts parse to real metadata") {
    graft.io.VerifyFixtures.avFixture()
    def bytes(n: Int) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${graft.io.VerifyFixtures.avDir}/av_00$n.bin"))
    assert(Multimodal.avHeaderMeta(bytes(1)) ===
      Some(Multimodal.AvMeta("audio/wav", 44100, 2, 200L, 1)))
    assert(Multimodal.avHeaderMeta(bytes(2)) ===
      Some(Multimodal.AvMeta("audio/flac", 48000, 2, 2000L, 1)))
    assert(Multimodal.avHeaderMeta(bytes(3)) ===
      Some(Multimodal.AvMeta("video/mp4", 0, 0, 2500L, 2)))
    assert(Multimodal.avHeaderMeta(bytes(4)) === None)
  }

  test("AV parse rejects truncated or malformed containers instead of misreading") {
    graft.io.VerifyFixtures.avFixture()
    val wav = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${graft.io.VerifyFixtures.avDir}/av_001.bin"))
    assert(Multimodal.avHeaderMeta(wav.take(20)) === None)         // truncated RIFF
    assert(Multimodal.avHeaderMeta(Array[Byte](1, 2, 3)) === None) // tiny garbage
    // an mp4 with a zero-size box must not loop or misparse
    val bad = java.nio.ByteBuffer.allocate(24)
    bad.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    bad.putInt(0).put("moov".getBytes("US-ASCII"))
    assert(Multimodal.avHeaderMeta(bad.array()) === None)
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
