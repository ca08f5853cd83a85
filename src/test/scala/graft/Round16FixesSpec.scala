package graft

import graft.pipeline.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins for the r15 advice findings:
  *   - MP4 box-size encodings beyond the plain u32 (ISO 14496-12 §4.2):
  *     `size == 1` (64-bit largesize — real files place `moov` after a
  *     > 4 GiB `mdat` this way) and `size == 0` (box extends to EOF, the
  *     common final-box form) parse instead of silently stubbing;
  *   - WebP chunk fields are bounded by the chunk's DECLARED size, not
  *     just the buffer — an undersized chunk can no longer consume the
  *     next chunk's bytes as dimensions;
  *   - [[graft.pipeline.Layout]] manifest reads swallow ONLY the
  *     vacuum-race FileNotFoundException; other IO faults propagate
  *     (spec'd via behavior equivalence on the good path — the negative
  *     side needs a faulting FS, pinned by the narrowed catch type).
  */
class Round16FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def be32(v: Long): Seq[Byte] = Seq(
    (v >>> 24 & 0xff).toByte, (v >>> 16 & 0xff).toByte,
    (v >>> 8 & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Seq[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
  private def cc(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq

  /** The syntheticMp4 fixture with its `moov` re-headered to use the
    * 64-bit largesize encoding (size field = 1, u64 size after the
    * fourcc). ftyp is the first 20 bytes by construction.
    */
  private def largesizeMoov(orig: Array[Byte]): Array[Byte] = {
    val ftyp = orig.take(20)
    val moovContent = orig.drop(20 + 8) // past the moov's 8-byte header
    (ftyp.toSeq ++ be32(1L) ++ cc("moov") ++ be64(16L + moovContent.length) ++
      moovContent.toSeq).toArray
  }

  test("MP4 size==1 (largesize) and size==0 (to-EOF) boxes parse, not stub") {
    import spark.implicits._
    val base = Multimodal.syntheticMp4(640, 360, 90000L)
    // moov re-encoded with a 64-bit largesize header
    val large = largesizeMoov(base)
    // the final box (moov) declaring size 0 = "extends to EOF"
    val toEof = base.clone()
    be32(0L).zipWithIndex.foreach { case (b, i) => toEof(20 + i) = b }
    // a trailing to-EOF free box after moov must not abort the walk
    val trailingFree = (base.toSeq ++ be32(0L) ++ cc("free")).toArray
    // truncated largesize header (size==1 but no room for the u64) → stub
    val truncLarge = large.take(24)
    val in = Seq(
      Multimodal.Asset(1L, "video", large),
      Multimodal.Asset(2L, "video", toEof),
      Multimodal.Asset(3L, "video", trailingFree),
      Multimodal.Asset(4L, "video", truncLarge)).toDS()
    val out = Multimodal.decode(in).collect().map(d => d.doc_id -> d).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).width == 640 && out(id).height == 360 &&
        out(id).n_frames == 90 && out(id).channels == 0,
        s"asset $id must parse the real metadata: ${out(id)}")
    }
    val stubOf = (n: Int) => (n % 640 + 1, (n * 7) % 480 + 1, n % 7 + 1)
    val (w, h, f) = stubOf(truncLarge.length)
    assert(out(4L).width == w && out(4L).height == h && out(4L).n_frames == f,
      s"truncated largesize header must stub, not crash: ${out(4L)}")
  }

  test("COVERAGE.md's documented gate count equals SparkEntry.queries.size") {
    // r15 shipped "229 gates" in the header while the registry carried 230
    // (the header predated the round's second gate) — the doc can state
    // anything it likes about WHAT the gates are, but the COUNT is now
    // pinned to the registry so it can't drift again (r15 verdict #3)
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get("COVERAGE.md"))
    val m = java.util.regex.Pattern.compile("\\*\\*(\\d+) gates as of")
      .matcher(text)
    assert(m.find(), "COVERAGE.md must carry a '**N gates as of …**' header")
    val documented = m.group(1).toInt
    assert(documented == SparkEntry.queries.size,
      s"COVERAGE.md documents $documented gates but SparkEntry.queries " +
        s"carries ${SparkEntry.queries.size} — update the header")
  }

  test("WebP undersized chunk cannot steal the next chunk's bytes as dims") {
    import spark.implicits._
    def le32(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, (v >>> 8 & 0xff).toByte,
      (v >>> 16 & 0xff).toByte, (v >>> 24 & 0xff).toByte)
    // VP8X declaring only 4 payload bytes (fields need 10), followed by a
    // VALID VP8L chunk. Pre-fix the VP8X parse read the VP8L chunk header
    // as its canvas fields; now the undersized chunk is skipped and the
    // VP8L parse supplies the real dimensions.
    val vp8l = Multimodal.syntheticWebP(123, 45, alpha = false, extended = false)
    val vp8lChunk = vp8l.drop(12) // the "VP8L" chunk incl. header
    val payload = (cc("VP8X") ++ le32(4) ++ Seq[Byte](0x10, 0, 0, 0) ++
      vp8lChunk.toSeq)
    val bytes = (cc("RIFF") ++ le32(4 + payload.length) ++ cc("WEBP") ++
      payload).toArray
    val out = Multimodal.decode(
      Seq(Multimodal.Asset(1L, "image", bytes)).toDS()).collect().head
    assert(out.width == 123 && out.height == 45 && out.channels == 3,
      s"dims must come from the valid VP8L chunk, not VP8X overread: $out")
  }
}
