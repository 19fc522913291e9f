package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extract as batched per-partition transforms.
  *
  * The Spark-side shape is the real thing — schema, partition-parallel
  * batch processing, typed Encoders; the DECODE ITSELF IS A STUB (this
  * container ships no image/audio codecs): [[fakeDecode]] derives
  * deterministic pseudo-metadata from the bytes so the pipeline is
  * testable end-to-end. Swap `decodeOne` for a real codec call to go
  * live; nothing else changes.
  *
  * Scale notes: mapPartitions keeps the codec invocation batched per
  * partition (amortized init, no per-row JNI churn); binary payloads
  * should be size-bucketed via `spark.sql.files.maxPartitionBytes` so a
  * partition of blobs fits executor memory.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class DecodedRow(doc_id: Long, media_type: String, byte_len: Long,
                        width: Int, height: Int, checksum: Long)

  /** Wrap a text column as an opaque binary payload + metadata — the
    * ingest step a real pipeline does when reading image bytes.
    */
  def packetize(docs: DataFrame, mediaType: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit(mediaType).as("media_type"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic pseudo-metadata from the payload bytes
    * (a real build calls an image codec here). Pure function of content
    * → replayable in tests.
    */
  private def decodeOne(m: MediaRow): DecodedRow = {
    val len = m.payload.length.toLong
    val checksum = m.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    DecodedRow(m.doc_id, m.media_type, len,
      width = (checksum % 640).toInt + 1,
      height = ((checksum / 640) % 480).toInt + 1,
      checksum = checksum)
  }

  /** Partition-batched decode: one iterator pass per partition, codec
    * init amortized (the pattern; the codec is stubbed).
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: open codec/context once here, close at iterator end
      it.map(decodeOne)
    }
  }

  /** Feature extraction over decoded metadata: fixed-width histogram of
    * byte values per doc (stand-in for pixel/spectral features), as a
    * plain DataFrame op so it stays codegen'd.
    */
  def byteFeatures(media: Dataset[MediaRow], bins: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap(m => m.payload.map(b => (m.doc_id, (b & 0xff) % bins)))
      .toDF("doc_id", "bin")
      .groupBy("doc_id", "bin").agg(count(lit(1)).as("n"))
  }
}
