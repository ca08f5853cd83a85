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

  test("cube time travel: snapshot at G-1 rolls up the pre-append state") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_tt", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 100.0)
    cube.set(Seq("2021", "Feb", "South", "sedan", "Sales"), 50.0)
    val dir = java.nio.file.Files.createTempDirectory("ztt_cube").toString
    // a cube without a store refuses every time-travel face loudly
    intercept[IllegalStateException] {
      new graft.core.Cube("bare_tt", c0.dimensions, spark, None).zStoreGeneration
    }
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    assert(cube.zStoreGeneration == 1L)
    // bulk append: one NEW address and one REPLACED address
    val batch = spark.createDataFrame(Seq(
      (cube.dimensions(0).idOf("2022"), cube.dimensions(1).idOf("Mar"),
        cube.dimensions(2).idOf("West"), cube.dimensions(3).idOf("coupe"),
        cube.dimensions(4).idOf("Sales"), 7.0),
      (cube.dimensions(0).idOf("2021"), cube.dimensions(1).idOf("Feb"),
        cube.dimensions(2).idOf("South"), cube.dimensions(3).idOf("sedan"),
        cube.dimensions(4).idOf("Sales"), 60.0)))
      .toDF("d0", "d1", "d2", "d3", "d4", "value")
    cube.appendZorderedStore(batch)
    assert(cube.zStoreGeneration == 2L,
      "a bulk append must bump the store generation")
    val snap = cube.snapshotAtGeneration(1L)
    snap.cacheEnabled = false
    // the snapshot reads the PRE-append state: old value at the replaced
    // address, the new address absent, the rollup at the old total
    assert(snap.get(Seq("2021", "Feb", "South", "sedan", "Sales")).contains(50.0))
    assert(snap.get(Seq("2022", "Mar", "West", "coupe", "Sales")).isEmpty)
    assert(snap.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(150.0))
    // the live cube reads the post-append state
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(100.0 + 60.0 + 7.0))
    // snapshots are READ-ONLY (round 17): a write would land in a
    // throwaway overlay — reject loudly instead, live cube untouched
    assert(snap.isReadOnlySnapshot)
    intercept[UnsupportedOperationException] {
      snap.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 1.0)
    }
    assert(cube.get(Seq("2021", "Jan", "North", "motorcycles", "Sales"))
      .contains(100.0))
    // a generation older than every retained manifest fails at selection
    intercept[NoSuchElementException] { cube.readZStoreAsOf(0L) }
  }

  test("streaming z-store ingest: N triggers end with <= 2 generations on disk") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zgc_stream", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 1.0)
    val dir = java.nio.file.Files.createTempDirectory("zgc_stream").toString
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    def id(d: Int, m: String) = cube.dimensions(d).idOf(m)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val months = Seq("Jan", "Feb", "Mar", "Apr", "Jun")
    // five separate AvailableNow runs = five trigger appends, each bumping
    // the store generation — the keep-2 auto-vacuum inside the cube append
    // must hold the on-disk manifest count at <= 2 THROUGHOUT, not just at
    // the end (a long-running intake stream never gets an "end")
    months.zipWithIndex.foreach { case (m, i) =>
      val mem = MemoryStream[(Int, Int, Int, Int, Int, Double)]
      mem.addData((id(0, "2022"), id(1, m), id(2, "West"), id(3, "coupe"),
        id(4, "Sales"), i + 1.0))
      val q = graft.streaming.Streaming.ingestIntoZStore(cube,
        mem.toDF().toDF("d0", "d1", "d2", "d3", "d4", "value"))
      q.awaitTermination(60000)
    }
    assert(cube.zStoreGeneration == 1L + months.size,
      "each trigger append must bump the generation")
    val manifests = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_zmanifest.g")).map(_.getName).sorted
    assert(manifests.length <= 2,
      s"an N-trigger stream must not accumulate manifest generations: " +
        s"${manifests.mkString(", ")}")
    // dead segment files of reclaimed generations are gone too: on-disk
    // parquet is bounded by the files the retained manifests reference
    val onDisk = {
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach { p =>
        if (p.toString.endsWith(".parquet")) buf += p.toString
      }
      buf.toSet
    }
    val referenced = (graft.pipeline.Layout
      .zorderManifestAsOf(spark, dir, Long.MaxValue)._2 ++
      graft.pipeline.Layout.zorderManifestAsOf(spark, dir,
        cube.zStoreGeneration - 1)._2)
      .map(zf => java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(zf.path).toUri.getPath).toString).toSet
    assert(onDisk.subsetOf(referenced),
      s"dead segments must be reclaimed: orphans ${(onDisk -- referenced).take(3)}")
    // the stream's writes all landed (1 base + 1..5 appended)
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(1.0 + (1 to 5).sum))
  }

  test("Ogg container metadata: OpusHead and Vorbis ID headers, granule duration") {
    import spark.implicits._
    val in = Seq(
      // Opus: rate from OpusHead, duration from the EOS granule at 48 kHz
      Multimodal.Asset(1L, "audio", Multimodal.syntheticOgg(opus = true, 16000, 2, 7)),
      // Vorbis: granule clock = the codec rate itself
      Multimodal.Asset(2L, "audio", Multimodal.syntheticOgg(opus = false, 44100, 1, 3)),
      // modality gate: Ogg bytes declared video must stub
      Multimodal.Asset(3L, "video", Multimodal.syntheticOgg(opus = true, 16000, 2, 7)),
      // truncated mid-page: parses the BOS header, loses the EOS granule → stub
      Multimodal.Asset(4L, "audio", Multimodal.syntheticOgg(opus = true, 16000, 2, 7).take(20)))
      .toDS()
    val out = Multimodal.decode(in).collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).width == 16000 && out(1L).height == 2 && out(1L).n_frames == 7 &&
      out(1L).channels == 2, s"OpusHead: ${out(1L)}")
    assert(out(2L).width == 44100 && out(2L).height == 1 && out(2L).n_frames == 3,
      s"Vorbis ID: ${out(2L)}")
    val stubOf = (n: Int) => (n % 640 + 1, (n * 7) % 480 + 1, n % 7 + 1)
    Seq(3L, 4L).foreach { id =>
      val (w, h, f) = stubOf(out(id).n_bytes)
      assert(out(id).width == w && out(id).height == h && out(id).n_frames == f &&
        out(id).channels == 0, s"asset $id must stub: ${out(id)}")
    }
  }

  test("MKV/EBML container metadata: varint walk, Info duration, Video dims") {
    import spark.implicits._
    val good = Multimodal.syntheticMkv(1280, 720, 42)
    // an unknown-size Segment (all size bits set) must still walk: patch
    // the fixture's 1-byte Segment size to 0xFF (unknown) — the element
    // then extends to EOF, the EBML analogue of MP4 size==0
    val unknownSeg = good.clone()
    // layout: EBML header = 4(id)+1(size=0x80); Segment id 4 bytes; size at 9
    assert((unknownSeg(9) & 0x80) != 0, "fixture Segment size must be 1-byte")
    unknownSeg(9) = 0xFF.toByte
    val in = Seq(
      Multimodal.Asset(1L, "video", good),
      Multimodal.Asset(2L, "video", unknownSeg),
      // modality gate: MKV bytes declared audio must stub
      Multimodal.Asset(3L, "audio", good),
      // truncated inside Tracks → no dims → stub, never an error
      Multimodal.Asset(4L, "video", good.take(good.length - 6))).toDS()
    val out = Multimodal.decode(in).collect().map(d => d.doc_id -> d).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id).width == 1280 && out(id).height == 720 &&
        out(id).n_frames == 42 && out(id).channels == 0,
        s"asset $id must parse the EBML metadata: ${out(id)}")
    }
    val stubOf = (n: Int) => (n % 640 + 1, (n * 7) % 480 + 1, n % 7 + 1)
    Seq(3L, 4L).foreach { id =>
      val (w, h, f) = stubOf(out(id).n_bytes)
      assert(out(id).width == w && out(id).height == h && out(id).n_frames == f &&
        out(id).channels == 0, s"asset $id must stub: ${out(id)}")
    }
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
