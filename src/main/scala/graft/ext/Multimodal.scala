package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
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
    * A real implementation would decode image/audio here (???) — the
    * surrounding plumbing (partition-wise batches, typed output schema)
    * is the part that matters to the engine.
    */
  def decodeStub(payload: Array[Byte]): (Long, Int, Int) = {
    var checksum = 1469598103934665603L
    var i = 0
    while (i < payload.length) { checksum = checksum * 31 + payload(i); i += 1 }
    val width = 16 + math.floorMod(checksum, 1024).toInt
    val height = 16 + math.floorMod(checksum >> 10, 1024).toInt
    (checksum, width, height)
  }

  /** Partition-wise decode/feature-extract: the Scala analogue of a
    * `mapInPandas` batch UDF — one iterator pass per partition, no
    * per-row task overhead, output schema fixed by the case class.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, w, h) = decodeStub(r.payload)
        MediaFeatures(r.id, r.mediaType, r.payload.length, checksum, w, h)
      }
    }
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
