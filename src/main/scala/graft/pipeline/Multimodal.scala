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

  /** `channels`: raster band count for real image decodes (1 = gray,
    * 3 = RGB, 4 = RGBA), audio channel count for WAV, 0 = unknown (the
    * payload went through the codec stub).
    */
  final case class DecodedAsset(
      doc_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, channels: Int, checksum: Long)

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
    * row order, same magnitude), bits-per-pixel at 28 → channel count.
    * Pure JVM header parse, no codec library. Plausibility bounds reject
    * text bytes that happen to start with "BM" (ASCII payload bytes make
    * the size fields astronomically large).
    */
  private[pipeline] def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 30 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
      val w = le32(b, 18); val h = math.abs(le32(b, 22))
      val bpp = le16(b, 28)
      if (w > 0 && w < (1 << 20) && h > 0 && h < (1 << 20))
        Some((w, h, math.max(1, bpp / 8))) else None
    } else None

  /** REAL decode, PNG/JPEG/GIF via `javax.imageio` — pure-JVM, ships in
    * the JDK, headless-safe. The magic sniff (PNG `\x89PNG`, JPEG
    * `FF D8 FF`, GIF `GIF8`) gates the codec attempt so arbitrary text
    * payloads never pay a parse; a sniff hit that still fails to decode
    * (truncated/corrupt stream) falls through to the stub rather than
    * erroring the task. Returns (width, height, raster band count:
    * 1 gray/palette-indexed — every GIF — / 3 RGB / 4 RGBA).
    */
  private[pipeline] def decodeImageIO(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val isPng = b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P'.toByte &&
      b(2) == 'N'.toByte && b(3) == 'G'.toByte
    val isJpeg = b.length >= 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte &&
      b(2) == 0xFF.toByte
    val isGif = b.length >= 6 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == '8'.toByte
    if (!isPng && !isJpeg && !isGif) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w > 0 && h > 0) Some((w, h, img.getRaster.getNumBands)) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic image-fixture ENCODER (PNG/JPEG/BMP via
    * `javax.imageio`): the planted-payload generator the decode gate uses.
    * Dimensions and grayness derive from the caller's seed, so an oracle
    * can state the expected decode metadata a priori without ever touching
    * a codec. Pixel fill is a fixed function of (x, y) — byte-identical
    * across runs and partitionings.
    */
  def syntheticImage(fmt: String, width: Int, height: Int, gray: Boolean): Array[Byte] = {
    require(width >= 1 && height >= 1, "fixture dims must be positive")
    val imgType =
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(width, height, imgType)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * 31 + y * 7) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, fmt, bos)
    require(ok, s"no JDK ImageIO writer for format '$fmt'")
    bos.toByteArray
  }

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

  /** STUB ??? — fallback for payloads that are not a JVM-decodable format
    * (BMP/WAV header parses and PNG/JPEG `javax.imageio` decodes are
    * REAL): a genuinely exotic format (video containers, FLAC, WebP …)
    * would need an external codec (e.g. ffmpeg) this container lacks, so
    * metadata is derived deterministically from the payload so the
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
    * iterator (no materialization of the partition in memory). BMP, PNG,
    * JPEG, GIF and WAV payloads decode for REAL (BMP via pure-JVM header
    * parse, PNG/JPEG/GIF via `javax.imageio`: → width/height/channels,
    * one frame; WAV → sample rate as width, channels as height, duration
    * seconds as n_frames); anything else falls back to the documented
    * stub with channels = 0.
    */
  def decode(in: Dataset[Asset]): Dataset[DecodedAsset] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { it =>
      // per-partition codec init: ImageIO's default read path spools
      // through a temp-file cache — keep decodes fully in-memory
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        // format sniffing is gated on the DECLARED modality: a text/video
        // payload that happens to start with a plausible image/"RIFF…WAVE"
        // header must not be reported with image/audio-shaped metadata
        val real: Option[(Int, Int, Int, Int)] =
          if (a.modality == "image")
            decodeImageIO(a.content).map { case (iw, ih, ch) => (iw, ih, 1, ch) }
              .orElse(decodeBmp(a.content).map { case (bw, bh, ch) => (bw, bh, 1, ch) })
          else if (a.modality == "audio")
            decodeWav(a.content).map { case (rate, ch, secs) => (rate, ch, secs, ch) }
          else None
        val (w, h, f, ch) = real.getOrElse {
          val (sw, sh, sf) = decodeStub(a.modality, a.content)
          (sw, sh, sf, 0)
        }
        DecodedAsset(a.doc_id, a.modality, a.content.length, w, h, f, ch,
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
