package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted via typed `mapPartitions`
  * (the Scala analogue of `mapInPandas` batch UDFs — partition-local batch
  * iteration, no driver involvement).
  *
  * Metadata decode is REAL for PNG/JPEG/GIF (`javax.imageio`) and for
  * BMP/WAV/WebP/FLAC/MP4/AVI/Ogg/MKV (pure-JVM header/container
  * parsers); only
  * pixel/sample decode of formats whose codecs this container lacks
  * routes to the clearly marked STUB (`decodeStub`), which derives
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
  private def le24(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 | (b(o + 2) & 0xff) << 16
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be24(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) << 16 | (b(o + 1) & 0xff) << 8 | (b(o + 2) & 0xff)
  private def fourcc(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

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
      // real BMPs carry 1..32 bpp; a wilder value is corrupt → stub
      if (w > 0 && w < (1 << 20) && h > 0 && h < (1 << 20) && bpp >= 1 && bpp <= 32)
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

  /** REAL decode, WebP container metadata (round 15): RIFF chunk walk over
    * a "WEBP" form, handling all three layouts — `VP8X` (extended: canvas
    * width/height as 24-bit LE minus-one fields, alpha from the flags
    * byte), `VP8L` (lossless: 0x2f signature then a 32-bit LSB-first word
    * packing width-1 (14 bits), height-1 (14), alpha (1)), and `VP8 `
    * (lossy: 3-byte frame tag, 9D 01 2A sync code, then 14-bit LE
    * width/height). Header/dimension parse is REAL and format-complete;
    * PIXEL decode would need libwebp, which this container lacks — the
    * operator's contract is ffprobe-style metadata, not rasters.
    * Returns (width, height, channels: 4 if the alpha bit is set, else 3;
    * lossy VP8 is always 3).
    */
  private[pipeline] def decodeWebP(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 22 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WEBP") return None
    var off = 12L
    var out: Option[(Int, Int, Int)] = None
    while (out.isEmpty && off + 8 <= b.length) {
      val o = off.toInt
      val id = fourcc(b, o)
      val sz = le32(b, o + 4).toLong & 0xFFFFFFFFL
      val p = o + 8 // chunk payload start
      // each case is bounded by the chunk's DECLARED size `sz` too, not
      // just the buffer (r15 advice): a chunk declaring fewer bytes than
      // the fields read would otherwise consume the NEXT chunk's bytes as
      // dimensions — bounded by the plausibility filter below, but wrong
      id match {
        case "VP8X" if sz >= 10 && off + 8 + 10 <= b.length =>
          val alpha = (b(p) & 0x10) != 0
          val w = le24(b, p + 4) + 1; val h = le24(b, p + 7) + 1
          out = Some((w, h, if (alpha) 4 else 3))
        case "VP8L" if sz >= 5 && off + 8 + 5 <= b.length && b(p) == 0x2f.toByte =>
          val word = le32(b, p + 1)
          val w = (word & 0x3FFF) + 1
          val h = (word >>> 14 & 0x3FFF) + 1
          val alpha = (word >>> 28 & 1) == 1
          out = Some((w, h, if (alpha) 4 else 3))
        case "VP8 " if sz >= 10 && off + 8 + 10 <= b.length &&
            b(p + 3) == 0x9d.toByte && b(p + 4) == 0x01.toByte && b(p + 5) == 0x2a.toByte =>
          val w = le16(b, p + 6) & 0x3FFF; val h = le16(b, p + 8) & 0x3FFF
          if (w > 0 && h > 0) out = Some((w, h, 3))
        case _ => ()
      }
      off += 8L + sz + (sz & 1L) // word-aligned; strictly advances
    }
    out.filter { case (w, h, _) => w < (1 << 20) && h < (1 << 20) }
  }

  /** Deterministic WebP fixture ENCODER: a structurally valid WebP
    * container carrying real dimension metadata — VP8X (extended canvas)
    * for even seeds, VP8L (lossless header word) for odd, so both parser
    * paths stay exercised by the oracle gate. The pixel stream is absent
    * (header-only), matching the decode contract above.
    */
  def syntheticWebP(width: Int, height: Int, alpha: Boolean, extended: Boolean): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0x3FFF && height <= 0x3FFF,
      "fixture dims must fit the 14-bit VP8L field")
    val bos = new java.io.ByteArrayOutputStream()
    def w32le(v: Int): Unit = { bos.write(v & 0xff); bos.write(v >>> 8 & 0xff)
      bos.write(v >>> 16 & 0xff); bos.write(v >>> 24 & 0xff) }
    val payload: Array[Byte] = if (extended) {
      val p = new java.io.ByteArrayOutputStream()
      def p24(v: Int): Unit = { p.write(v & 0xff); p.write(v >>> 8 & 0xff)
        p.write(v >>> 16 & 0xff) }
      p.write(if (alpha) 0x10 else 0x00); p.write(0); p.write(0); p.write(0)
      p24(width - 1); p24(height - 1)
      p.toByteArray
    } else {
      val word = (width - 1) | (height - 1) << 14 | (if (alpha) 1 << 28 else 0)
      Array[Byte](0x2f.toByte,
        (word & 0xff).toByte, (word >>> 8 & 0xff).toByte,
        (word >>> 16 & 0xff).toByte, (word >>> 24 & 0xff).toByte)
    }
    val chunkId = if (extended) "VP8X" else "VP8L"
    val padded = payload.length + (payload.length & 1)
    // RIFF size = "WEBP" (4) + chunk header (8) + padded payload
    bos.write("RIFF".getBytes("US-ASCII")); w32le(4 + 8 + padded)
    bos.write("WEBP".getBytes("US-ASCII"))
    bos.write(chunkId.getBytes("US-ASCII")); w32le(payload.length)
    bos.write(payload); if ((payload.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  /** REAL decode, FLAC STREAMINFO (round 15): "fLaC" magic, then the
    * mandatory first metadata block (type 0, 34 bytes) — sample rate
    * (20 bits), channels-1 (3), bits-per-sample-1 (5) and total samples
    * (36) packed MSB-first in one 64-bit field. The metadata-block walk is
    * REAL and handles non-first STREAMINFO defensively; FRAME decode
    * (the Rice-coded subframes) would need a codec pass this operator's
    * metadata contract doesn't ask for. Returns (sample_rate, channels,
    * duration whole seconds, min 1) — same shape as the WAV decode.
    */
  private[pipeline] def decodeFlac(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 8 || !(b(0) == 'f'.toByte && b(1) == 'L'.toByte &&
        b(2) == 'a'.toByte && b(3) == 'C'.toByte)) return None
    var off = 4L
    var out: Option[(Int, Int, Int)] = None
    var last = false
    while (out.isEmpty && !last && off + 4 <= b.length) {
      val o = off.toInt
      val hdr = b(o) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val blen = be24(b, o + 1)
      if (btype == 0 && blen >= 34 && off + 4 + 34 <= b.length) {
        val p = o + 4 + 10 // skip min/max blocksize (4) + min/max framesize (6)
        val hi = be32(b, p); val lo = be32(b, p + 4)
        val packed = hi << 32 | lo
        val rate = (packed >>> 44).toInt
        val ch = (packed >>> 41 & 0x7).toInt + 1
        val totalSamples = packed & ((1L << 36) - 1)
        if (rate > 0 && rate <= 1000000) {
          val secs = math.max(1L, (totalSamples + rate - 1) / rate)
          if (secs <= 86400L) out = Some((rate, ch, secs.toInt))
        }
      }
      off += 4L + (blen.toLong & 0xFFFFFF) // u24 length; strictly advances
    }
    out
  }

  /** Deterministic FLAC fixture ENCODER: magic + a single last-flagged
    * STREAMINFO block with the given rate/channels/total-samples (16-bit
    * depth, zero MD5 — legal: "0 = unknown").
    */
  def syntheticFlac(sampleRate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) && channels >= 1 && channels <= 8 &&
      totalSamples >= 0 && totalSamples < (1L << 36), "STREAMINFO field bounds")
    val out = new Array[Byte](4 + 4 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last block, type 0 (STREAMINFO)
    out(5) = 0; out(6) = 0; out(7) = 34
    // min/max blocksize = 4096, min/max framesize = 0 (unknown)
    out(8) = 0x10; out(9) = 0x00; out(10) = 0x10; out(11) = 0x00
    val packed = sampleRate.toLong << 44 | (channels - 1).toLong << 41 |
      15L << 36 /* bps-1 for 16-bit */ | totalSamples
    var i = 0
    while (i < 8) { out(18 + i) = (packed >>> (56 - 8 * i) & 0xff).toByte; i += 1 }
    out // bytes 26..51 (MD5) stay zero
  }

  /** REAL decode, Ogg container metadata (round 16): page walk ("OggS"
    * capture pattern, version 0, 27-byte header + segment table) to the
    * BOS page's codec ID header — `OpusHead` (channels at payload offset
    * 9, 16-bit pre-skip, 32-bit LE input sample rate) or Vorbis
    * (packet type 1 + "vorbis", channels at offset 11, 32-bit LE rate) —
    * then on through the pages for the LAST granule position, which is
    * the stream's duration clock: 48 kHz samples for Opus (minus
    * pre-skip), codec-rate samples for Vorbis. Page CRCs are NOT
    * verified (the contract is bounds-checked metadata, not integrity);
    * a malformed page stops the walk and the best granule seen so far
    * stands. Returns (sample_rate, channels, whole seconds, min 1) —
    * same shape as the WAV/FLAC decodes.
    */
  private[pipeline] def decodeOgg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 28 || fourcc(b, 0) != "OggS") return None
    var rate = -1; var ch = -1; var preSkip = 0L
    var divisor = -1L // granule units per second
    var lastGranule = -1L
    // duration evidence must come from a NON-BOS page: the BOS/ID page
    // carries granule 0 by spec, which would otherwise satisfy
    // `lastGranule >= 0` and decode a truncated header-only stream as a
    // 1-second asset instead of routing to the stub (r16 advice)
    var sawDataGranule = false
    var serial = 0
    var first = true
    var off = 0L
    var ok = true
    while (ok && off + 27 <= b.length) {
      val o = off.toInt
      if (fourcc(b, o) != "OggS" || b(o + 4) != 0) ok = false
      else {
        val granule = (le32(b, o + 6).toLong & 0xFFFFFFFFL) |
          ((le32(b, o + 10).toLong & 0xFFFFFFFFL) << 32)
        val pageSerial = le32(b, o + 14)
        val nseg = b(o + 26) & 0xff
        if (off + 27 + nseg > b.length) ok = false
        else {
          var payLen = 0L
          var i = 0
          while (i < nseg) { payLen += (b(o + 27 + i) & 0xff); i += 1 }
          val p = o + 27 + nseg
          if (off + 27 + nseg + payLen > b.length) ok = false
          else {
            if (first) {
              serial = pageSerial
              first = false
              if (payLen >= 19 && fourcc(b, p) == "Opus" &&
                  fourcc(b, p + 4) == "Head") {
                ch = b(p + 9) & 0xff
                preSkip = le16(b, p + 10).toLong
                rate = le32(b, p + 12)
                divisor = 48000L // Opus granules are ALWAYS 48 kHz samples
              } else if (payLen >= 30 && b(p) == 0x01 &&
                  new String(b, p + 1, 6, "US-ASCII") == "vorbis") {
                ch = b(p + 11) & 0xff
                rate = le32(b, p + 12)
                divisor = rate.toLong
              }
            }
            if (pageSerial == serial && granule >= 0 && granule != -1L) {
              if ((b(o + 5) & 0x02) == 0) sawDataGranule = true
              lastGranule = math.max(lastGranule, granule)
            }
            off += 27L + nseg + payLen // header is fixed-size; strictly advances
          }
        }
      }
    }
    if (rate > 0 && rate <= 1000000 && ch >= 1 && ch <= 16 &&
        divisor > 0 && lastGranule >= 0 && sawDataGranule) {
      val samples = math.max(0L, lastGranule - preSkip)
      val secs = math.max(1L, (samples + divisor - 1) / divisor)
      if (secs <= 86400L) Some((rate, ch, secs.toInt)) else None
    } else None
  }

  /** Deterministic Ogg fixture ENCODER: a BOS page carrying the codec ID
    * header (OpusHead for `opus = true`, the Vorbis identification header
    * otherwise) and an EOS page whose granule position encodes
    * `durationSecs` in the codec's clock (48 kHz for Opus, `sampleRate`
    * for Vorbis) — so both codecs decode to IDENTICAL metadata, letting
    * the probe gate alternate them under one oracle like MP4/AVI. Page
    * CRCs are zero (the parser's contract doesn't verify them).
    */
  def syntheticOgg(opus: Boolean, sampleRate: Int, channels: Int,
      durationSecs: Int): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate <= 1000000 && channels >= 1 &&
      channels <= 16 && durationSecs >= 1 && durationSecs <= 86400,
      "ID-header field bounds")
    val bos = new java.io.ByteArrayOutputStream()
    def w32le(v: Long): Unit = { var i = 0; while (i < 4) {
      bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    def w64le(v: Long): Unit = { var i = 0; while (i < 8) {
      bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def page(headerType: Int, granule: Long, seq: Int, payload: Array[Byte]): Unit = {
      require(payload.length < 255, "single-segment fixture pages only")
      cc("OggS"); bos.write(0); bos.write(headerType)
      w64le(granule); w32le(1L) /* serial */; w32le(seq.toLong)
      w32le(0L) /* CRC unverified by the parser */
      bos.write(1); bos.write(payload.length) // one segment
      bos.write(payload)
    }
    val idHeader: Array[Byte] = if (opus) {
      val p = new java.io.ByteArrayOutputStream()
      p.write("OpusHead".getBytes("US-ASCII"))
      p.write(1) /* version */; p.write(channels)
      p.write(0); p.write(0) /* pre-skip 0 */
      var i = 0; while (i < 4) { p.write((sampleRate >>> (8 * i)) & 0xff); i += 1 }
      p.write(0); p.write(0) /* output gain */; p.write(0) /* mapping family */
      p.toByteArray
    } else {
      val p = new java.io.ByteArrayOutputStream()
      p.write(0x01); p.write("vorbis".getBytes("US-ASCII"))
      var i = 0; while (i < 4) { p.write(0); i += 1 } /* version 0 */
      p.write(channels)
      i = 0; while (i < 4) { p.write((sampleRate >>> (8 * i)) & 0xff); i += 1 }
      i = 0; while (i < 12) { p.write(0); i += 1 } /* bitrate fields */
      p.write(0xB8) /* blocksizes 256/4096 */; p.write(0x01) /* framing */
      p.toByteArray
    }
    val granule = (if (opus) 48000L else sampleRate.toLong) * durationSecs
    page(0x02 /* BOS */, 0L, 0, idHeader)
    page(0x04 /* EOS */, granule, 1, Array.emptyByteArray)
    bos.toByteArray
  }

  /** REAL decode, MP4/ISO-BMFF container metadata (round 15): top-level
    * box walk (size.u32 BE + fourcc) to `moov`, then its children —
    * `mvhd` v0/v1 yields timescale + duration (→ whole seconds, min 1),
    * `trak`/`tkhd` v0/v1 yields track width/height as 16.16 fixed-point.
    * The box walk is REAL ISO 14496-12 structure; SAMPLE decode (the
    * codec payload in `mdat`) would need ffmpeg-class codecs this
    * container lacks. Returns (width, height, duration seconds);
    * channels is reported 0 — a container parse has no raster to count
    * bands on, and 0 keeps the "no pixel decode happened" signal honest.
    */
  private[pipeline] def decodeMp4(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 16 || fourcc(b, 4) != "ftyp") return None
    var w = 0; var h = 0; var secs = -1
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var off = start
      while (off + 8 <= end && depth < 8) {
        val o = off.toInt
        // ISO 14496-12 §4.2 size encodings (r15 advice): size == 1 means a
        // 64-bit `largesize` follows the fourcc (payload shifts to +16 —
        // real files place moov after a > 4 GiB mdat this way); size == 0
        // means "this box extends to the end of the enclosing container"
        // (legal only for the last box). Both used to read as malformed
        // and silently routed common real MP4s to the stub.
        val sz32 = be32(b, o)
        val (sz, hdr) =
          if (sz32 == 1L && off + 16 <= end)
            ((be32(b, o + 8) << 32) | be32(b, o + 12), 16)
          else if (sz32 == 0L) (end - off, 8)
          else (sz32, 8)
        val id = fourcc(b, o + 4)
        if (sz < hdr || off + sz > end) return // malformed size: stop this level
        val p = o + hdr
        id match {
          case "moov" | "trak" => walk(off + hdr, off + sz, depth + 1)
          case "mvhd" if sz >= hdr + 20 =>
            val v = b(p) & 0xff
            // version-exact reads only: a truncated v1 box must NOT fall
            // back to reading v0 offsets (they hold creation/modification
            // times there — plausible garbage); and the v1 64-bit duration
            // is untrusted — bound it against the timescale BEFORE the
            // ceil-division so a wrapped-negative or absurd value routes
            // to the stub (r15 review: same class decodeAvi already guards)
            val tsDur: Option[(Long, Long)] =
              if (v == 0) Some((be32(b, p + 12), be32(b, p + 16)))
              else if (v == 1 && sz >= hdr + 32)
                Some((be32(b, p + 20), (be32(b, p + 24) << 32) | be32(b, p + 28)))
              else None
            tsDur.foreach { case (ts, dur) =>
              if (ts > 0 && dur >= 0 && dur <= 86400L * 30 * ts) {
                secs = math.max(1L, (dur + ts - 1) / ts).toInt
              }
            }
          case "tkhd" if sz >= hdr + 84 =>
            val v = b(p) & 0xff
            val dimsOff = if (v == 1) p + 4 + 32 + 52 else p + 4 + 20 + 52
            if (dimsOff + 8 <= o + sz.toInt) {
              val tw = (be32(b, dimsOff) >>> 16).toInt
              val th = (be32(b, dimsOff + 4) >>> 16).toInt
              if (tw > 0 && th > 0 && tw < (1 << 16) && th < (1 << 16)) { w = tw; h = th }
            }
          case _ => ()
        }
        off += sz
      }
    }
    walk(0L, b.length.toLong, 0)
    if (secs > 0 && w > 0 && h > 0) Some((w, h, secs)) else None
  }

  /** Deterministic MP4 fixture ENCODER: `ftyp` (isom) + `moov` { `mvhd` v0
    * (timescale 1000, the given duration in ms) + `trak` { `tkhd` v0
    * (16.16 fixed-point width/height) } }. Structure-complete for the
    * metadata contract; no `mdat` (no samples), matching the parse above.
    */
  def syntheticMp4(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width < (1 << 16) && height < (1 << 16) &&
      durationMs >= 0 && durationMs <= Int.MaxValue, "tkhd/mvhd field bounds")
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = { bos.write((v >>> 24 & 0xff).toInt); bos.write((v >>> 16 & 0xff).toInt)
      bos.write((v >>> 8 & 0xff).toInt); bos.write((v & 0xff).toInt) }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def zeros(n: Int): Unit = { var i = 0; while (i < n) { bos.write(0); i += 1 } }
    // ftyp
    w32(20); cc("ftyp"); cc("isom"); w32(512); cc("isom")
    // moov = 8 + mvhd(108) + trak(8 + tkhd(92)) = 216
    w32(216); cc("moov")
    // mvhd v0: 108 = 8 hdr + 100 payload
    w32(108); cc("mvhd"); w32(0) /* version+flags */
    w32(0); w32(0) /* creation, modification */
    w32(1000) /* timescale */; w32(durationMs)
    w32(0x00010000L) /* rate 1.0 */; bos.write(1); bos.write(0) /* volume 1.0 */
    zeros(10) /* reserved */
    // unity matrix
    w32(0x00010000L); w32(0); w32(0); w32(0); w32(0x00010000L); w32(0)
    w32(0); w32(0); w32(0x40000000L)
    zeros(24) /* pre_defined */; w32(2) /* next track id */
    // trak wraps tkhd
    w32(100); cc("trak")
    // tkhd v0: 92 = 8 hdr + 84 payload
    w32(92); cc("tkhd"); w32(7) /* version 0, flags: enabled|in-movie|in-preview */
    w32(0); w32(0) /* creation, modification */
    w32(1) /* track id */; w32(0) /* reserved */; w32(durationMs)
    zeros(8) /* reserved */; zeros(2) /* layer */; zeros(2) /* alt group */
    zeros(2) /* volume (0 for video) */; zeros(2) /* reserved */
    w32(0x00010000L); w32(0); w32(0); w32(0); w32(0x00010000L); w32(0)
    w32(0); w32(0); w32(0x40000000L)
    w32(width.toLong << 16); w32(height.toLong << 16)
    bos.toByteArray
  }

  /** REAL decode, AVI main header (round 15): RIFF form "AVI ", LIST
    * "hdrl" → "avih" chunk — dwMicroSecPerFrame (payload offset 0),
    * dwTotalFrames (16), dwWidth (32), dwHeight (36); duration =
    * usPerFrame × totalFrames, reported in whole seconds (min 1) like the
    * MP4 path. Same contract: container metadata REAL, sample decode
    * stubbed (codec-bound).
    */
  private[pipeline] def decodeAvi(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 24 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    var off = 12L
    var out: Option[(Int, Int, Int)] = None
    while (out.isEmpty && off + 8 <= b.length) {
      val o = off.toInt
      val id = fourcc(b, o)
      val sz = le32(b, o + 4).toLong & 0xFFFFFFFFL
      if (id == "LIST" && off + 12 <= b.length && fourcc(b, o + 8) == "hdrl") {
        // walk inside the hdrl list for the mandatory avih chunk
        var in = off + 12L
        val end = math.min(off + 8 + sz, b.length.toLong)
        while (out.isEmpty && in + 8 <= end) {
          val io = in.toInt
          val isz = le32(b, io + 4).toLong & 0xFFFFFFFFL
          if (fourcc(b, io) == "avih" && in + 8 + 40 <= end) {
            val usPerFrame = le32(b, io + 8).toLong & 0xFFFFFFFFL
            val totalFrames = le32(b, io + 8 + 16).toLong & 0xFFFFFFFFL
            val w = le32(b, io + 8 + 32); val h = le32(b, io + 8 + 36)
            // both fields are untrusted u32s: bound BEFORE multiplying —
            // usPerFrame × totalFrames can overflow Long and wrap to a
            // plausible-but-wrong duration (r15 review). ≤10 s/frame and
            // ≤2^32 frames keeps the product well under Long.MaxValue.
            if (w > 0 && w < (1 << 16) && h > 0 && h < (1 << 16) &&
                usPerFrame > 0 && usPerFrame <= 10000000L) {
              val usTotal = usPerFrame * totalFrames
              val secs = math.max(1L, (usTotal + 999999L) / 1000000L)
              if (secs <= 86400L * 30) out = Some((w, h, secs.toInt))
            }
          }
          in += 8L + isz + (isz & 1L)
        }
      }
      off += 8L + sz + (sz & 1L) // word-aligned; strictly advances
    }
    out
  }

  /** EBML variable-length integer at offset `o`: the leading-zero count of
    * the first byte gives the width (1–8 bytes); element IDs keep the
    * marker bit, sizes clear it. Returns (value, widthBytes); None on
    * truncation or a zero first byte (reserved/invalid).
    */
  private def ebmlVarint(b: Array[Byte], o: Int,
      clearMarker: Boolean): Option[(Long, Int)] = {
    if (o >= b.length) return None
    val first = b(o) & 0xff
    if (first == 0) return None
    val n = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (n < 1 || n > 8 || o + n > b.length) return None
    var v = (if (clearMarker) first & ((1 << (8 - n)) - 1) else first).toLong
    var i = 1
    while (i < n) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
    Some((v, n))
  }

  /** REAL decode, Matroska/EBML container metadata (round 16): EBML
    * varint walk through Segment → Info (TimestampScale, default 10⁶ ns;
    * Duration as a 4/8-byte float in scale ticks) and Segment → Tracks →
    * TrackEntry → Video (PixelWidth/PixelHeight, taken only from a
    * track whose TrackType says video — or omits it). Unknown-size
    * elements (all size bits set — live-muxed Segments) extend to the
    * enclosing end, the EBML analogue of MP4's size==0. Returns
    * (width, height, duration whole seconds, min 1); channels is 0 like
    * the other video containers — no raster was decoded.
    */
  private[pipeline] def decodeMkv(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 8 || be32(b, 0) != 0x1A45DFA3L) return None
    var w = 0; var h = 0
    var tsScale = 1000000L
    var durTicks = -1.0
    def uintOf(o: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
      v
    }
    def walk(start: Long, end: Long, depth: Int, videoTrack: Boolean): Unit = {
      var off = start
      var ok = depth < 8
      while (ok && off + 2 <= end) {
        val parsed = for {
          (id, idn) <- ebmlVarint(b, off.toInt, clearMarker = false)
          (sz0, szn) <- ebmlVarint(b, (off + idn).toInt, clearMarker = true)
        } yield (id, idn, sz0, szn)
        parsed match {
          case None => ok = false
          case Some((id, idn, sz0, szn)) =>
            val p = off + idn + szn
            // all-ones size = unknown: legal for the streamed Segment —
            // extends to the enclosing end; elsewhere it's malformed
            val unknown = sz0 == (1L << (7 * szn)) - 1
            val sz =
              if (unknown && id == 0x18538067L) end - p
              else sz0
            if (unknown && id != 0x18538067L) ok = false
            else if (p + sz > end || sz < 0) ok = false
            else {
              id match {
                case 0x18538067L => walk(p, p + sz, depth + 1, videoTrack) // Segment
                case 0x1549A966L => walk(p, p + sz, depth + 1, videoTrack) // Info
                case 0x1654AE6BL => walk(p, p + sz, depth + 1, videoTrack) // Tracks
                case 0xAEL =>
                  // TrackEntry: video ONLY on an explicit TrackType == 1.
                  // TrackType is mandatory per Matroska — a malformed
                  // TrackEntry that omits it must not get to supply
                  // PixelWidth/PixelHeight (r16 advice: default
                  // conservative on untrusted input)
                  var isVideo = false
                  var io = p
                  var scanning = true
                  while (scanning && io + 2 <= p + sz) {
                    (for {
                      (cid, cidn) <- ebmlVarint(b, io.toInt, clearMarker = false)
                      (csz, cszn) <- ebmlVarint(b, (io + cidn).toInt, clearMarker = true)
                    } yield (cid, cidn, csz, cszn)) match {
                      case Some((cid, cidn, csz, cszn))
                          if io + cidn + cszn + csz <= p + sz =>
                        if (cid == 0x83L && csz >= 1 && csz <= 8)
                          isVideo = uintOf((io + cidn + cszn).toInt, csz.toInt) == 1L
                        io += cidn + cszn + csz
                      case _ => scanning = false
                    }
                  }
                  walk(p, p + sz, depth + 1, isVideo)
                case 0xE0L if videoTrack => walk(p, p + sz, depth + 1, videoTrack) // Video
                case 0x2AD7B1L if sz >= 1 && sz <= 8 =>
                  val v = uintOf(p.toInt, sz.toInt)
                  if (v > 0) tsScale = v
                case 0x4489L if sz == 4 =>
                  durTicks = java.lang.Float.intBitsToFloat(uintOf(p.toInt, 4).toInt).toDouble
                case 0x4489L if sz == 8 =>
                  durTicks = java.lang.Double.longBitsToDouble(uintOf(p.toInt, 8))
                case 0xB0L if videoTrack && sz >= 1 && sz <= 4 =>
                  val v = uintOf(p.toInt, sz.toInt)
                  if (v > 0 && v < (1 << 16)) w = v.toInt
                case 0xBAL if videoTrack && sz >= 1 && sz <= 4 =>
                  val v = uintOf(p.toInt, sz.toInt)
                  if (v > 0 && v < (1 << 16)) h = v.toInt
                case _ => () // skip: CRC, Void, Cluster, audio tracks, …
              }
              off = p + sz
            }
        }
      }
    }
    walk(0L, b.length.toLong, 0, videoTrack = false)
    if (w > 0 && h > 0 && durTicks > 0 && tsScale > 0) {
      val ns = durTicks * tsScale
      // bound BEFORE the division-to-seconds (untrusted float × untrusted
      // scale — NaN/inf/absurd routes to the stub, same class as mvhd)
      if (ns.isNaN || ns.isInfinite || ns > 86400.0 * 30 * 1e9) None
      else Some((w, h, math.max(1L, math.ceil(ns / 1e9).toLong).toInt))
    } else None
  }

  /** Deterministic MKV fixture ENCODER: minimal EBML header + Segment {
    * Info { TimestampScale 10⁶, Duration float64 in ms ticks }, Tracks {
    * TrackEntry { TrackType 1, Video { PixelWidth, PixelHeight } } } } —
    * so the decoded duration equals `durationSecs` exactly and the probe
    * gate can rotate MP4/AVI/MKV under one oracle.
    */
  def syntheticMkv(width: Int, height: Int, durationSecs: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && width < (1 << 16) && height < (1 << 16) &&
      durationSecs >= 1 && durationSecs <= 86400, "EBML field bounds")
    def uintBytes(v: Long): Array[Byte] = {
      var n = 1; while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)
    }
    def el(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127, "fixture elements are 1-byte-size only")
      idBytes ++ Array((payload.length | 0x80).toByte) ++ payload
    }
    def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    val video = el(id(0xE0),
      el(id(0xB0), uintBytes(width)) ++ el(id(0xBA), uintBytes(height)))
    val trackEntry = el(id(0xAE), el(id(0x83), uintBytes(1)) ++ video)
    val tracks = el(id(0x16, 0x54, 0xAE, 0x6B), trackEntry)
    val durBits = java.lang.Double.doubleToLongBits(durationSecs * 1000.0)
    val info = el(id(0x15, 0x49, 0xA9, 0x66),
      el(id(0x2A, 0xD7, 0xB1), uintBytes(1000000L)) ++
        el(id(0x44, 0x89), Array.tabulate(8)(i =>
          ((durBits >>> (8 * (7 - i))) & 0xff).toByte)))
    val segment = el(id(0x18, 0x53, 0x80, 0x67), info ++ tracks)
    val ebmlHeader = el(id(0x1A, 0x45, 0xDF, 0xA3), Array.emptyByteArray)
    ebmlHeader ++ segment
  }

  /** Deterministic AVI fixture ENCODER: RIFF "AVI " + LIST "hdrl" holding
    * one avih main header at 25 fps (40 000 µs/frame), 25·seconds total
    * frames — so the decoded duration equals `durationSecs` exactly and
    * matches the MP4 fixture arithmetic (the probe gate alternates the two
    * containers under ONE oracle).
    */
  def syntheticAvi(width: Int, height: Int, durationSecs: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && width < (1 << 16) && height < (1 << 16) &&
      durationSecs >= 1 && durationSecs <= 86400, "avih field bounds")
    val bos = new java.io.ByteArrayOutputStream()
    def w32le(v: Long): Unit = { bos.write((v & 0xff).toInt); bos.write((v >>> 8 & 0xff).toInt)
      bos.write((v >>> 16 & 0xff).toInt); bos.write((v >>> 24 & 0xff).toInt) }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val avihPayload = 56 // standard MainAVIHeader size
    val listSz = 4 + 8 + avihPayload // "hdrl" + avih chunk
    cc("RIFF"); w32le(4 + 8 + listSz) // "AVI " + LIST chunk
    cc("AVI ")
    cc("LIST"); w32le(listSz); cc("hdrl")
    cc("avih"); w32le(avihPayload)
    w32le(40000L) /* dwMicroSecPerFrame: 25 fps */
    w32le(0); w32le(0); w32le(0) /* maxBytesPerSec, padding, flags */
    w32le(25L * durationSecs) /* dwTotalFrames */
    w32le(0); w32le(1); w32le(0) /* initialFrames, streams, suggestedBuf */
    w32le(width); w32le(height)
    w32le(0); w32le(0); w32le(0); w32le(0) /* dwReserved[4] */
    bos.toByteArray
  }

  /** STUB ??? — fallback for payloads no REAL parser above claims
    * (PNG/JPEG/GIF decode via `javax.imageio`; BMP/WAV/WebP/FLAC/MP4/AVI
    * — rounds 13-15 — plus Ogg Opus/Vorbis and MKV/EBML, round 16 —
    * header+container metadata via the pure-JVM parsers). What
    * remains stubbed is narrow and honest: PIXEL/SAMPLE decode for
    * WebP/FLAC/MP4 payloads (needs libwebp/libflac/ffmpeg-class codecs
    * this container lacks — the metadata contract doesn't ask for it) and
    * nothing else — MKV/EBML joined the real parsers in round 16,
    * closing the container list. Stub metadata derives
    * deterministically from the payload so the pipeline shape (schema,
    * batching, downstream ops) stays fully testable.
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
    * iterator (no materialization of the partition in memory). Nine
    * formats carry REAL metadata decodes — images: PNG/JPEG/GIF via
    * `javax.imageio`, BMP/WebP via pure-JVM header parse (→ width/height/
    * channels, one frame); audio: WAV/FLAC/Ogg (→ sample rate as width,
    * channels as height, duration seconds as n_frames); video: MP4/AVI
    * container walks (→ track width/height, duration seconds as n_frames,
    * channels 0 = no raster decoded). Anything else falls back to the
    * documented stub with channels = 0. Sniffing is gated on the DECLARED
    * modality so a text payload with a coincidental magic never reports
    * another modality's metadata shape.
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
              .orElse(decodeWebP(a.content).map { case (ww, wh, ch) => (ww, wh, 1, ch) })
          else if (a.modality == "audio")
            decodeWav(a.content).map { case (rate, ch, secs) => (rate, ch, secs, ch) }
              .orElse(decodeFlac(a.content).map { case (rate, ch, secs) => (rate, ch, secs, ch) })
              .orElse(decodeOgg(a.content).map { case (rate, ch, secs) => (rate, ch, secs, ch) })
          else if (a.modality == "video")
            decodeMp4(a.content).map { case (vw, vh, secs) => (vw, vh, secs, 0) }
              .orElse(decodeAvi(a.content).map { case (vw, vh, secs) => (vw, vh, secs, 0) })
              .orElse(decodeMkv(a.content).map { case (vw, vh, secs) => (vw, vh, secs, 0) })
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
