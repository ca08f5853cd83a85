package graft

import graft.pipeline.TextDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins:
  *   - the LSH hot-bucket cap (r16 verdict #1): a skewed fixture with one
  *     giant identical-text bucket completes in bounded work, the cap is
  *     REPORTED (count + example bucket hashes), genuine near-dup pairs
  *     outside the hot bucket still verify, and a clean corpus reports a
  *     zero-exclusion run with pairs identical to the uncapped operator;
  *   - the same guard on [[TextDedup.simhashPairs]] (identical docs share
  *     ALL four chunks, so one template bucket goes quadratic there too).
  */
class Round17FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 2_000 identical-text docs (ids 0-1999, the "template bucket") plus two
    * genuine near-dup pairs of 20-word docs (ids 10_000/10_001 differ in 1
    * word; 10_010/10_011 differ in 2) and a distinct singleton.
    */
  private def skewedDocs = {
    import spark.implicits._
    val words20 = (0 until 20).map(i => s"t$i")
    val nd = (w: Seq[String]) => w.mkString(" ")
    val hot = (0 until 2000).map(i => (i.toLong, "spam spam lovely spam wonderful spam brand boilerplate footer"))
    val tail = Seq(
      (10000L, nd(words20)),
      (10001L, nd(words20.updated(19, "zz"))),
      (10010L, nd(words20.map(w => w + "x"))),
      (10011L, nd(words20.map(w => w + "x").updated(0, "q0").updated(1, "q1"))),
      (20000L, "a lone unrelated document about spark catalyst plans"))
    (hot ++ tail).toDF("doc_id", "text")
  }

  test("minhashLshPairs: hot buckets are capped, reported, and the near-dup tail still verifies") {
    val pairs = TextDedup.minhashLshPairs(skewedDocs, "doc_id", "text",
      k = 64, bands = 16, threshold = 0.8, maxBucket = 500)
    val got = pairs.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 2000-doc template bucket is excluded: no pair touches ids < 2000
    assert(got.forall { case (i, j) => i >= 10000 && j >= 10000 },
      s"hot-bucket ids leaked into the pair list: $got")
    // the genuine near-dups outside the hot bucket still pair up
    assert(got.contains((10000L, 10001L)), s"missing near-dup pair: $got")
    assert(got.contains((10010L, 10011L)), s"missing near-dup pair: $got")
    // loud accounting: every band's bucket for the template text exceeds the
    // cap (16 bands → 16 hot buckets of 2000 rows each)
    val rep = TextDedup.lastLshSkew.getOrElse(fail("no skew report"))
    assert(rep.hotBuckets == 16, s"expected 16 hot buckets: $rep")
    assert(rep.excludedRows == 16L * 2000, s"expected 32000 excluded banded rows: $rep")
    assert(rep.maxBucket == 500 && rep.examples.nonEmpty &&
      rep.examples.forall(_._3 == 2000L), s"examples must name the buckets: $rep")
    pairs.unpersist()
  }

  test("minhashLshPairs: a clean corpus reports zero exclusions and matches the uncapped pairs") {
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 15).map(j => s"w${(i * 31 + j * 7) % 400}").mkString(" "))
    }.toDF("doc_id", "text")
    val capped = TextDedup.minhashLshPairs(docs, "doc_id", "text",
      k = 64, bands = 16, threshold = 0.5, maxBucket = 100)
    val cappedSet = capped.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rep = TextDedup.lastLshSkew
    assert(rep.exists(r => r.hotBuckets == 0 && r.excludedRows == 0),
      s"clean run must report a zero-exclusion pass: $rep")
    val uncapped = TextDedup.minhashLshPairs(docs, "doc_id", "text",
      k = 64, bands = 16, threshold = 0.5, maxBucket = Int.MaxValue)
    val uncappedSet = uncapped.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedSet == uncappedSet, "cap must be a no-op on a clean corpus")
    capped.unpersist(); uncapped.unpersist()
  }

  test("Ogg: a header-only stream (no completed data page) stubs, not a 1-second asset") {
    import graft.pipeline.Multimodal
    import spark.implicits._
    val full = Multimodal.syntheticOgg(opus = true, 16000, 2, 7)
    // cut at the second page boundary: BOS page = 27-byte header (byte 26 =
    // segment count) + 1 lacing byte + payload
    val bosLen = 27 + 1 + (full(27) & 0xff)
    assert(new String(full, bosLen, 4, "US-ASCII") == "OggS", "fixture layout moved")
    val bosOnly = full.take(bosLen)
    // the BOS page carries granule 0 — pre-fix this decoded as a 1-second
    // asset; duration evidence must come from a non-BOS page (r16 advice)
    val out = Multimodal.decode(
      Seq(Multimodal.Asset(1L, "audio", bosOnly)).toDS()).collect().head
    val (w, h, f) = (out.n_bytes % 640 + 1, (out.n_bytes * 7) % 480 + 1, out.n_bytes % 7 + 1)
    assert(out.width == w && out.height == h && out.n_frames == f && out.channels == 0,
      s"header-only Ogg must stub: $out")
  }

  test("MKV: a TrackEntry omitting the mandatory TrackType is NOT a video track") {
    import graft.pipeline.Multimodal
    import spark.implicits._
    // same layout as syntheticMkv but the TrackEntry omits TrackType (0x83)
    def uintBytes(v: Long): Array[Byte] = {
      var n = 1; while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)
    }
    def el(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] =
      idBytes ++ Array((payload.length | 0x80).toByte) ++ payload
    def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    val video = el(id(0xE0),
      el(id(0xB0), uintBytes(1280)) ++ el(id(0xBA), uintBytes(720)))
    val trackEntry = el(id(0xAE), video) // NO TrackType element
    val tracks = el(id(0x16, 0x54, 0xAE, 0x6B), trackEntry)
    val durBits = java.lang.Double.doubleToLongBits(42 * 1000.0)
    val info = el(id(0x15, 0x49, 0xA9, 0x66),
      el(id(0x2A, 0xD7, 0xB1), uintBytes(1000000L)) ++
        el(id(0x44, 0x89), Array.tabulate(8)(i =>
          ((durBits >>> (8 * (7 - i))) & 0xff).toByte)))
    val segment = el(id(0x18, 0x53, 0x80, 0x67), info ++ tracks)
    val bytes = el(id(0x1A, 0x45, 0xDF, 0xA3), Array.emptyByteArray) ++ segment
    val out = Multimodal.decode(
      Seq(Multimodal.Asset(1L, "video", bytes)).toDS()).collect().head
    val (w, h, f) = (out.n_bytes % 640 + 1, (out.n_bytes * 7) % 480 + 1, out.n_bytes % 7 + 1)
    assert(out.width == w && out.height == h && out.n_frames == f,
      s"a TrackType-less TrackEntry must not supply dims — stub expected: $out")
  }

  test("as-of snapshot cubes reject every mutation face and keep serving reads") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_ro", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 100.0)
    val dir = java.nio.file.Files.createTempDirectory("ro_snap").toString
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    val snap = cube.snapshotAtGeneration(1L)
    snap.cacheEnabled = false
    assert(snap.isReadOnlySnapshot && !cube.isReadOnlySnapshot)
    val addr = Seq("2021", "Jan", "North", "motorcycles", "Sales")
    intercept[UnsupportedOperationException] { snap.set(addr, 1.0) }
    intercept[UnsupportedOperationException] { snap.delete(addr) }
    intercept[UnsupportedOperationException] { snap.setPayload(addr, "note") }
    intercept[UnsupportedOperationException] {
      snap.registerRule(graft.olap.RuleDef(Map("measures" -> "Sales"),
        graft.olap.RuleScope.BaseLevel, graft.olap.RuleExpr.Lit(1.0), "r"))
    }
    intercept[UnsupportedOperationException] { snap.removeRule("any") }
    // the read faces still serve, and the rejected writes left no residue
    assert(snap.get(addr).contains(100.0))
    assert(snap.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(100.0))
  }

  test("streaming z-store: as-of snapshot isolation across triggers, retention boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zasof_stream", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 10.0)
    val dir = java.nio.file.Files.createTempDirectory("zasof_stream").toString
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    def id(d: Int, m: String) = cube.dimensions(d).idOf(m)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def trigger(month: String, v: Double): Unit = {
      val mem = MemoryStream[(Int, Int, Int, Int, Int, Double)]
      mem.addData((id(0, "2022"), id(1, month), id(2, "West"), id(3, "coupe"),
        id(4, "Sales"), v))
      graft.streaming.Streaming.ingestIntoZStore(cube,
        mem.toDF().toDF("d0", "d1", "d2", "d3", "d4", "value"))
        .awaitTermination(60000)
    }
    // snapshot at generation 1 (the pre-stream compaction), then commit
    // trigger 1 → generation 2: the reader keeps generation-1 semantics
    // while the stream commits — snapshot ISOLATION under streaming intake
    val snapG1 = cube.snapshotAtGeneration(1L)
    snapG1.cacheEnabled = false
    trigger("Feb", 2.0)
    assert(cube.zStoreGeneration == 2L)
    val total = Seq("All years", "Year", "Total", "Total", "Sales")
    assert(cube.get(total).contains(12.0), "live cube sees the trigger commit")
    assert(snapG1.get(total).contains(10.0),
      "the generation-1 snapshot must NOT see the in-flight trigger's commit")
    assert(snapG1.get(Seq("2022", "Feb", "West", "coupe", "Sales")).isEmpty)
    // the snapshot is read-only under streaming exactly like batch
    intercept[UnsupportedOperationException] {
      snapG1.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 0.0)
    }
    // two more triggers push the keep-2 retention window past generation
    // 1: a NEW as-of read at g1 must fail loudly at manifest selection
    // (never mid-scan), while the retained window still time-travels
    trigger("Mar", 3.0)
    trigger("Apr", 4.0)
    assert(cube.zStoreGeneration == 4L)
    intercept[NoSuchElementException] { cube.snapshotAtGeneration(1L) }
    val snapG3 = cube.snapshotAtGeneration(3L)
    snapG3.cacheEnabled = false
    assert(snapG3.get(total).contains(15.0),
      "generation-3 snapshot = base + Feb + Mar, not Apr")
  }

  test("simhashPairs: the template bucket is capped with the same accounting") {
    val pairs = TextDedup.simhashPairs(skewedDocs, "doc_id", "text",
      maxHamming = 3, maxBucket = 500)
    val got = pairs.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (i, j) => i >= 10000 && j >= 10000 },
      s"hot-bucket ids leaked into the simhash pair list: $got")
    val rep = TextDedup.lastLshSkew.getOrElse(fail("no skew report"))
    // identical docs share the signature, hence ALL 4 chunk buckets are hot
    assert(rep.hotBuckets == 4 && rep.excludedRows == 4L * 2000 &&
      rep.examples.forall(_._3 == 2000L), s"simhash skew report wrong: $rep")
    pairs.unpersist()
  }
}
