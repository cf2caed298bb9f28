package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction staged as partition-wise batch
  * transforms.
  *
  * The Spark-side contract is real — schema, partitioning, batch shape,
  * and the `binaryFile` source all work at scale. The decode itself is a
  * STUB (`decodeStub`): image/audio codecs aren't available in this
  * environment, so it derives deterministic fake features from the
  * bytes. Swapping in a real codec changes one function, nothing else.
  */
object Multimodal {

  /** Typed row for the decode stage. */
  case class MediaRow(id: Long, payload: Array[Byte], mediaType: String)

  /** Extracted features: what a real decoder would emit, shape-wise. */
  case class MediaFeatures(
      id: Long, mediaType: String, byteLength: Int,
      checksum: Long, width: Int, height: Int)

  /** Read real files as binary payloads via Spark's binaryFile source
    * (path, modificationTime, length, content).
    */
  def readBinaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** Attach an opaque binary payload + metadata struct to a text frame —
    * the canonical "multimodal table" shape: id, binary, typed metadata.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("content_type"),
        length(col(textCol)).as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic fake features from the payload bytes.
    * A real PIXEL decode would need a codec library (absent here; ???),
    * but container HEADERS are pure byte arithmetic — see
    * [[imageHeaderDims]], which the feature extractor prefers when the
    * payload carries a known magic number.
    */
  def decodeStub(payload: Array[Byte]): (Long, Int, Int) = {
    var checksum = 1469598103934665603L
    var i = 0
    while (i < payload.length) { checksum = checksum * 31 + payload(i); i += 1 }
    val width = 16 + math.floorMod(checksum, 1024).toInt
    val height = 16 + math.floorMod(checksum >> 10, 1024).toInt
    (checksum, width, height)
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** REAL header parse — (format, width, height) from the container
    * header bytes, no codec needed:
    *  - PNG: IHDR width/height, big-endian at offsets 16/20 after the
    *    8-byte signature (public PNG spec).
    *  - GIF: logical screen size, little-endian at offset 6.
    *  - JPEG: scan the marker stream for a SOFn segment (0xC0–0xCF
    *    minus C4/C8/CC); height/width big-endian at +5/+7.
    * Unknown or truncated payloads → None (the stub takes over).
    */
  def imageHeaderDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length >= 24 &&
        b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A)
      Some(("png", be32(b, 16), be32(b, 20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some(("gif", le16(b, 6), le16(b, 8)))
    else if (b.length >= 4 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) {
      // JPEG: walk the marker stream until a frame header. Per ISO
      // 10918-1 B.1.1.2, any marker may be preceded by 0xFF fill bytes,
      // and TEM (0x01) / RSTn (0xD0-D7) are standalone markers with no
      // length field.
      var i = 2
      while (i + 1 < b.length) {
        if (b(i) != 0xFF.toByte) return None // desynced marker stream
        while (i + 1 < b.length && b(i + 1) == 0xFF.toByte) i += 1 // fill bytes
        if (i + 1 >= b.length) return None
        val marker = b(i + 1) & 0xFF
        if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          return if (i + 9 < b.length) Some(("jpeg", be16(b, i + 7), be16(b, i + 5)))
          else None // truncated frame header
        }
        if (marker == 0xD9) return None // EOI before any frame header
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
        else if (i + 3 < b.length) i += 2 + be16(b, i + 2) // length incl. itself
        else return None
      }
      None
    } else None
  }

  /** Partition-wise decode/feature-extract: the Scala analogue of a
    * `mapInPandas` batch UDF — one iterator pass per partition, no
    * per-row task overhead, output schema fixed by the case class.
    * Known container headers yield REAL dimensions (and override the
    * declared media type); everything else gets the stub's
    * deterministic fakes.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, sw, sh) = decodeStub(r.payload)
        imageHeaderDims(r.payload) match {
          case Some((fmt, w, h)) =>
            MediaFeatures(r.id, s"image/$fmt", r.payload.length, checksum, w, h)
          case None =>
            MediaFeatures(r.id, r.mediaType, r.payload.length, checksum, sw, sh)
        }
      }
    }
  }

  /** Expression-only PNG dimensions — the codegen'd zero-copy path for
    * the overwhelmingly common case: when the payload starts with the
    * PNG signature, width/height are fixed-offset big-endian ints, so
    * `substring`+`hex`+`conv` extract them inside whole-stage codegen
    * with no UDF and no partition-wise pass. Non-PNG → null.
    */
  def pngDims(payload: Column): Column = {
    val magic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val isPng = substring(payload, 1, 8) === lit(magic)
    struct(
      when(isPng, conv(hex(substring(payload, 17, 4)), 16, 10).cast("int")).as("width"),
      when(isPng, conv(hex(substring(payload, 21, 4)), 16, 10).cast("int")).as("height"))
  }

  /** Expression-only feature projection over a binary column (length,
    * first byte) — the cheap path that needs no decode at all.
    */
  def binaryMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(payloadCol)).as("n_bytes"),
      ascii(col(payloadCol).cast("string")).as("first_byte"))
}
