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

  private def payloadChecksum(bytes: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    checksum
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 | (b(o + 2) & 0xff) << 16 | (b(o + 3) & 0xff) << 24
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | (b(o + 1) & 0xff) << 8

  /** REAL decode, BMP: dimensions from the BITMAPINFOHEADER — magic "BM",
    * little-endian width at offset 18, height at 22 (negative = top-down
    * row order, same magnitude). Pure JVM header parse, no codec library.
    * Plausibility bounds reject text bytes that happen to start with "BM"
    * (ASCII payload bytes make the size fields astronomically large).
    */
  private[pipeline] def decodeBmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
      val w = le32(b, 18); val h = math.abs(le32(b, 22))
      if (w > 0 && w < (1 << 20) && h > 0 && h < (1 << 20)) Some((w, h)) else None
    } else None

  /** REAL decode, WAV: RIFF chunk walk — "fmt " yields channels / sample
    * rate / bit depth, "data" yields payload size; duration =
    * dataSize / (rate × channels × bytesPerSample), reported in whole
    * seconds (min 1). Pure JVM header parse; declared sizes are trusted so
    * truncated payloads still decode their metadata.
    */
  private[pipeline] def decodeWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 44 ||
        !(b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte && b(3) == 'F'.toByte) ||
        !(b(8) == 'W'.toByte && b(9) == 'A'.toByte && b(10) == 'V'.toByte && b(11) == 'E'.toByte))
      return None
    // chunk walk in LONG arithmetic: declared sizes are untrusted bytes — a
    // corrupt/adversarial size must neither spin the loop (advance ≤ 0) nor
    // overflow the offset (OOB read); malformed input falls back to the stub
    var off = 12L
    var rate = 0; var ch = 0; var bits = 0; var dataLen = -1L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val sz = le32(b, o + 4).toLong & 0xFFFFFFFFL
      if (id == "fmt " && off + 24 <= b.length) {
        ch = le16(b, o + 10); rate = le32(b, o + 12); bits = le16(b, o + 22)
      } else if (id == "data") dataLen = sz
      off += 8L + sz + (sz & 1L) // chunks are word-aligned; strictly advances
    }
    if (rate > 0 && rate <= 1000000 && ch > 0 && ch <= 16 &&
        Set(8, 16, 24, 32).contains(bits) && dataLen >= 0) {
      val bytesPerSec = rate.toLong * ch * (bits / 8)
      val secs = math.max(1L, (dataLen + bytesPerSec - 1) / bytesPerSec)
      // dataLen is an untrusted u32 and bytesPerSec can be 1 (rate=1, ch=1,
      // bits=8) — a duration past 24h is implausible, not audio: stub it
      if (secs <= 86400L) Some((rate, ch, secs.toInt)) else None
    } else None
  }

  /** STUB ??? — fallback for payloads that are not a JVM-parseable format:
    * a real implementation would call an image/audio/video codec
    * (e.g. libjpeg / ffmpeg) on `bytes`. This container has no media libs,
    * so metadata is derived deterministically from the payload so the
    * pipeline shape (schema, batching, downstream ops) is fully testable.
    */
  private def decodeStub(modality: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val width = n % 640 + 1
    val height = (n * 7) % 480 + 1
    val frames = n % 7 + 1
    (width, height, frames)
  }

  /** Decode pass: typed mapPartitions — one codec context per partition
    * (the expensive-init pattern batch UDFs exist for), streaming the
    * iterator (no materialization of the partition in memory). BMP and WAV
    * payloads decode for REAL (pure-JVM header parse: BMP → width/height,
    * one frame; WAV → sample rate as width, channels as height, duration
    * seconds as n_frames); anything else falls back to the documented stub.
    */
  def decode(in: Dataset[Asset]): Dataset[DecodedAsset] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { it =>
      // per-partition codec init would happen here
      it.map { a =>
        // header sniffing is gated on the DECLARED modality: a text/video
        // payload that happens to start with a plausible "BM"/"RIFF…WAVE"
        // header must not be reported with image/audio-shaped metadata
        val real =
          if (a.modality == "image") decodeBmp(a.content).map { case (bw, bh) => (bw, bh, 1) }
          else if (a.modality == "audio") decodeWav(a.content)
          else None
        val (w, h, f) = real.getOrElse(decodeStub(a.modality, a.content))
        DecodedAsset(a.doc_id, a.modality, a.content.length, w, h, f,
          payloadChecksum(a.content))
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
