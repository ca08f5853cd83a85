package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted via typed `mapPartitions`
  * (the Scala analogue of `mapInPandas` batch UDFs — partition-local batch
  * iteration, no driver involvement).
  *
  * The actual codec call is a clearly marked STUB (`decodeStub`): the
  * image/audio libraries are not in this container, so it derives
  * deterministic fake metadata from the byte stream. The Spark-side
  * plumbing — schema, encoders, partition batching, frame-sample explode —
  * is real and oracle-tested.
  */
object Multimodal {

  final case class Asset(doc_id: Long, modality: String, content: Array[Byte])
  final case class DecodedAsset(
      doc_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Build a binary-column asset table from the documents table (text bytes
    * stand in for media payloads; modality assigned round-robin).
    */
  def assets(documents: DataFrame): Dataset[Asset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content")).as[Asset]
  }

  /** STUB ??? — real implementation would call an image/audio/video codec
    * (e.g. libjpeg / ffmpeg) on `bytes`. This container has no media libs,
    * so metadata is derived deterministically from the payload so the
    * pipeline shape (schema, batching, downstream ops) is fully testable.
    */
  private def decodeStub(modality: String, bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val n = bytes.length
    var checksum = 0L
    var i = 0
    while (i < n) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    val width = n % 640 + 1
    val height = (n * 7) % 480 + 1
    val frames = n % 7 + 1
    (width, height, frames, checksum)
  }

  /** Decode pass: typed mapPartitions — one codec context per partition
    * (the expensive-init pattern batch UDFs exist for), streaming the
    * iterator (no materialization of the partition in memory).
    */
  def decode(in: Dataset[Asset]): Dataset[DecodedAsset] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { it =>
      // per-partition codec init would happen here
      it.map { a =>
        val (w, h, f, c) = decodeStub(a.modality, a.content)
        DecodedAsset(a.doc_id, a.modality, a.content.length, w, h, f, c)
      }
    }
  }

  /** Frame sampling: one row per sampled frame index (stride 2) — the
    * explode-shaped fan-out a video pipeline feeds to per-frame models.
    */
  def sampleFrames(decoded: Dataset[DecodedAsset], stride: Int = 2): DataFrame =
    decoded.toDF().select(col("doc_id"), col("modality"), col("n_bytes"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
