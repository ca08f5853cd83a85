package graft

import graft.pipeline.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 hardening pins (r13 verdict #3/#4 + advice):
  *   - single-pass [[Layout.zorderAppend]] — the batch source evaluates at
  *     most twice per append (it was three source reads per streaming
  *     micro-batch);
  *   - versioned manifest commit — a racing writer's commit is DETECTED
  *     ([[Layout.StaleManifestException]]) instead of last-rename-wins
  *     orphaning the other's rewrite;
  *   - deferred dead-file deletion — readers pinned on a pre-append file
  *     list survive the append window; [[Layout.zorderVacuum]] reclaims;
  *   - superseded z-store backing fails loudly — a compact() between
  *     compactToZorderedStore and appendZorderedStore no longer silently
  *     reverts folded overlay writes;
  *   - duplicate addresses within one append batch collapse to one row.
  */
class Round14FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exists(path: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(new java.net.URI(path).getPath))

  test("zorderAppend evaluates the batch source at most twice") {
    val dir = java.nio.file.Files.createTempDirectory("z14scan").toString
    val base = spark.range(500).select(col("id"),
      pmod(hash(col("id")), lit(16)).cast("long").as("a"),
      pmod(hash(col("id") * 7), lit(16)).cast("long").as("b"))
    val zc = Seq(col("a"), col("b"))
    Layout.zorderWrite(spark, dir, base, zc, bits = 4, numFiles = 4)
    // the accumulator bumps once per partition per evaluation; one
    // partition ⇒ acc.value == number of source scans
    val acc = spark.sparkContext.longAccumulator("batchScans")
    val batch = (1000L until 1050L).toDS().repartition(1)
      .mapPartitions { it => acc.add(1L); it }
      .select(col("value").as("id"), (col("value") % 4).as("a"),
        (col("value") % 4).as("b"))
    val st = Layout.zorderAppend(spark, dir, batch, zc, bits = 4)
    assert(st.batchRows == 50L)
    assert(acc.value <= 2L,
      s"batch source evaluated ${acc.value} times — the r13 3x regression")
    assert(Layout.zorderRead(spark, dir).count() == 550L)
  }

  test("racing manifest commits: the stale writer throws, no live file lost") {
    val dir = java.nio.file.Files.createTempDirectory("z14race").toString
    val base = spark.range(400).select(col("id"),
      pmod(hash(col("id")), lit(16)).cast("long").as("a"),
      pmod(hash(col("id") * 3), lit(16)).cast("long").as("b"))
    val zc = Seq(col("a"), col("b"))
    Layout.zorderWrite(spark, dir, base, zc, bits = 4, numFiles = 4)
    assert(Layout.zorderGeneration(spark, dir) == 1L)
    val batchA = spark.range(1000, 1030).select(col("id"),
      (col("id") % 4).as("a"), (col("id") % 4).as("b"))
    val batchB = spark.range(2000, 2040).select(col("id"),
      (col("id") % 4 + 8).as("a"), (col("id") % 4 + 8).as("b"))
    // writer A reaches its commit point AFTER writer B's full append lands
    Layout.appendCommitSeam = () => {
      Layout.appendCommitSeam = () => ()
      Layout.zorderAppend(spark, dir, batchB, zc, bits = 4)
    }
    try {
      intercept[Layout.StaleManifestException] {
        Layout.zorderAppend(spark, dir, batchA, zc, bits = 4)
      }
    } finally Layout.appendCommitSeam = () => ()
    // B's commit survives untouched: generation moved exactly twice (write +
    // B), every manifest path is on disk, and the read is base ∪ batchB
    assert(Layout.zorderGeneration(spark, dir) == 2L)
    val manifest = Layout.zorderManifest(spark, dir)
    manifest.foreach(zf => assert(exists(zf.path), s"orphaned live file: $zf"))
    assert(Layout.zorderRead(spark, dir).count() == 440L)
    assert(Layout.zorderRead(spark, dir).filter(col("id") >= 2000).count() == 40L)
    // the loser's segment files are orphans — vacuum reclaims them and
    // leaves every live file alone
    Layout.zorderVacuum(spark, dir)
    manifest.foreach(zf => assert(exists(zf.path)))
    assert(Layout.zorderRead(spark, dir).count() == 440L)
  }

  test("append defers deletion: a pinned pre-append reader survives; vacuum reclaims") {
    val dir = java.nio.file.Files.createTempDirectory("z14defer").toString
    val base = spark.range(600).select(col("id"),
      pmod(hash(col("id")), lit(16)).cast("long").as("a"),
      pmod(hash(col("id") * 5), lit(16)).cast("long").as("b"))
    val zc = Seq(col("a"), col("b"))
    Layout.zorderWrite(spark, dir, base, zc, bits = 4, numFiles = 4)
    val pinned = Layout.zorderRead(spark, dir) // plans over the OLD file list
    val batch = spark.range(5000, 5050).select(col("id"),
      (col("id") % 4).as("a"), (col("id") % 4).as("b"))
    val st = Layout.zorderAppend(spark, dir, batch, zc, bits = 4)
    assert(st.rewrittenFiles.nonEmpty)
    // dead files stay on disk — the pinned reader still evaluates (this
    // threw FileNotFoundException when the append deleted eagerly)
    st.rewrittenFiles.foreach(p => assert(exists(p), s"deleted too early: $p"))
    assert(pinned.count() == 600L)
    // explicit GC once no pre-append reader can exist
    val deleted = Layout.zorderVacuum(spark, dir)
    assert(st.rewrittenFiles.forall(p => !exists(p)),
      s"vacuum left dead files: $deleted")
    Layout.zorderManifest(spark, dir).foreach(zf => assert(exists(zf.path)))
    assert(Layout.zorderRead(spark, dir).count() == 650L)
  }

  test("encrypted z-store: incremental contract intact through modular encryption") {
    val dir = java.nio.file.Files.createTempDirectory("z14enc").toString
    val (wOpts, rOpts) = graft.core.Crypto.parquetEncryption("spec-key",
      new graft.core.Crypto.AesGcm("pw").deriveKey("0123456789abcdef".getBytes))
    val base = spark.range(800).select(col("id"),
      pmod(hash(col("id")), lit(16)).cast("long").as("a"),
      pmod(hash(col("id") * 7), lit(16)).cast("long").as("b"))
    val zc = Seq(col("a"), col("b"))
    Layout.zorderWrite(spark, dir, base, zc, bits = 4, numFiles = 6,
      pqOptions = wOpts)
    // keyless read refused on the encrypted footer
    intercept[Exception] { Layout.zorderRead(spark, dir).collect() }
    // confined append: only overlapping files re-cluster, encrypted ones
    // included — the hot-file read decrypts through the same options
    val batch = spark.range(9000, 9040).select(col("id"),
      (col("id") % 4).as("a"), (col("id") % 4).as("b"))
    val st = Layout.zorderAppend(spark, dir, batch, zc, bits = 4,
      pqOptions = wOpts)
    assert(st.rewrittenFiles.nonEmpty && st.untouchedFiles.nonEmpty, s"$st")
    assert(Layout.zorderRead(spark, dir, pqOptions = rOpts).count() == 840L)
    // vacuum is name-based — reclaims encrypted dead files all the same
    Layout.zorderVacuum(spark, dir)
    assert(st.rewrittenFiles.forall(p => !java.nio.file.Files.exists(
      java.nio.file.Paths.get(new java.net.URI(p).getPath))))
    assert(Layout.zorderRead(spark, dir, pqOptions = rOpts).count() == 840L)
  }

  test("cube z-store append vacuums with a one-append grace") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zgrace", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 10.0)
    cube.set(Seq("2021", "Feb", "South", "sedan", "Sales"), 20.0)
    val dir = java.nio.file.Files.createTempDirectory("z14grace").toString
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    def batch(year: String, month: String, v: Double) =
      spark.createDataFrame(Seq((cube.dimensions(0).idOf(year),
        cube.dimensions(1).idOf(month), cube.dimensions(2).idOf("West"),
        cube.dimensions(3).idOf("coupe"), cube.dimensions(4).idOf("Sales"), v)))
        .toDF("d0", "d1", "d2", "d3", "d4", "value")
    val st1 = cube.appendZorderedStore(batch("2021", "Mar", 1.0))
    // the files append-1 killed survive ITS vacuum (a reader pinned on the
    // pre-append base may still list them)…
    st1.rewrittenFiles.foreach(p => assert(exists(p),
      s"append-1 vacuumed its own dead files: $p"))
    val st2 = cube.appendZorderedStore(batch("2021", "Apr", 2.0))
    // …and are reclaimed by append-2 (grace expired); append-2's own dead
    // files in turn survive
    st1.rewrittenFiles.filterNot(st2.rewrittenFiles.toSet)
      .foreach(p => assert(!exists(p), s"grace never expired for: $p"))
    st2.rewrittenFiles.foreach(p => assert(exists(p)))
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(33.0))
  }

  test("encrypted CUBE z-store: rollups through opaque-at-rest facts, appends included") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zenc", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 100.0)
    cube.set(Seq("2021", "Feb", "South", "sedan", "Sales"), 50.0)
    val dir = java.nio.file.Files.createTempDirectory("z14cubenc").toString
    val enc = graft.core.Crypto.parquetEncryption("cube-zstore",
      new graft.core.Crypto.AesGcm("olap at rest").deriveKey("saltsaltsaltsalt".getBytes))
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2,
      encryption = Some(enc)))
    // the stored facts are opaque: a keyless read of a manifest file throws
    val firstFile = Layout.zorderManifest(spark, dir).head.path
    intercept[Exception] { spark.read.parquet(firstFile).collect() }
    // reads and rollups decrypt through the cube's stored options
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(150.0))
    // an append writes NEW encrypted segments and replaces in place
    val batch = spark.createDataFrame(Seq(
      (cube.dimensions(0).idOf("2021"), cube.dimensions(1).idOf("Feb"),
        cube.dimensions(2).idOf("South"), cube.dimensions(3).idOf("sedan"),
        cube.dimensions(4).idOf("Sales"), 60.0)))
      .toDF("d0", "d1", "d2", "d3", "d4", "value")
    val st = cube.appendZorderedStore(batch)
    st.newFiles.foreach(p =>
      intercept[Exception] { spark.read.parquet(p).collect() })
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(160.0))
  }

  test("history-enabled z-store cube: appends never auto-vacuum; undo restores old file sets") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zhist", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.enableHistory()
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 10.0)
    val dir = java.nio.file.Files.createTempDirectory("z14hist").toString
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    def batch(month: String, v: Double) =
      spark.createDataFrame(Seq((cube.dimensions(0).idOf("2021"),
        cube.dimensions(1).idOf(month), cube.dimensions(2).idOf("West"),
        cube.dimensions(3).idOf("coupe"), cube.dimensions(4).idOf("Sales"), v)))
        .toDF("d0", "d1", "d2", "d3", "d4", "value")
    val st1 = cube.appendZorderedStore(batch("Mar", 1.0))
    cube.appendZorderedStore(batch("Apr", 2.0))
    // history snapshots pin base frames over OLD file sets — with history
    // enabled nothing auto-vacuums, so every logged state stays readable
    st1.rewrittenFiles.foreach(p => assert(exists(p),
      s"auto-vacuum deleted a history-pinned file: $p"))
    assert(cube.get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(13.0))
    assert(cube.history.undo()) // back to the post-Mar state
    assert(cube.get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(11.0),
      "the restored state must read from its (kept) old file set")
  }

  test("a compact() between store compaction and append fails the append loudly") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zstale", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 100.0)
    val dir = java.nio.file.Files.createTempDirectory("z14stale").toString
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    // overlay write, then compact(): the write folds into base and leaves
    // the overlay — the on-disk store no longer reflects `base`
    cube.set(Seq("2021", "Feb", "South", "sedan", "Sales"), 50.0)
    assert(cube.compact())
    val batch = spark.createDataFrame(Seq((cube.dimensions(0).idOf("2022"),
      cube.dimensions(1).idOf("Mar"), cube.dimensions(2).idOf("West"),
      cube.dimensions(3).idOf("coupe"), cube.dimensions(4).idOf("Sales"), 7.0)))
      .toDF("d0", "d1", "d2", "d3", "d4", "value")
    val ex = intercept[IllegalStateException] { cube.appendZorderedStore(batch) }
    assert(ex.getMessage.contains("superseded"),
      s"wrong failure: ${ex.getMessage}")
    // the folded write is intact — this was the silent-loss path (r13
    // advice, medium: the swap would have reverted base to the stale store)
    assert(cube.get(Seq("2021", "Feb", "South", "sedan", "Sales")).contains(50.0))
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(150.0))
    // re-syncing re-arms the append path
    val dir2 = java.nio.file.Files.createTempDirectory("z14stale2").toString
    assert(cube.compactToZorderedStore(dir2, Seq(0, 1), files = 2))
    cube.appendZorderedStore(batch)
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(157.0))
  }

  test("duplicate addresses within one append batch collapse to one row") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zdup", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 10.0)
    val dir = java.nio.file.Files.createTempDirectory("z14dup").toString
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    val addr = Seq(cube.dimensions(0).idOf("2022"), cube.dimensions(1).idOf("Mar"),
      cube.dimensions(2).idOf("West"), cube.dimensions(3).idOf("coupe"),
      cube.dimensions(4).idOf("Sales"))
    val batch = spark.createDataFrame(Seq(
      (addr(0), addr(1), addr(2), addr(3), addr(4), 5.0),
      (addr(0), addr(1), addr(2), addr(3), addr(4), 9.0)))
      .toDF("d0", "d1", "d2", "d3", "d4", "value")
    cube.appendZorderedStore(batch)
    // one row per address in the store — reads must not sum the duplicates
    // (which survivor is arbitrary; callers wanting an order pre-aggregate)
    assert(Layout.zorderManifest(spark, dir).map(_.rows).sum == 2L)
    val v = cube.get(Seq("2022", "Mar", "West", "coupe", "Sales"))
    assert(v.contains(5.0) || v.contains(9.0), s"summed duplicates: $v")
  }

  test("streaming ingest into an ENCRYPTED z-store: opaque at rest, rollup correct") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zenc_stream", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 5.0)
    val dir = java.nio.file.Files.createTempDirectory("z14encstream").toString
    val enc = graft.core.Crypto.parquetEncryption("stream-zstore",
      new graft.core.Crypto.AesGcm("intake").deriveKey("0123456789abcdef".getBytes))
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2,
      encryption = Some(enc)))
    def id(d: Int, m: String) = cube.dimensions(d).idOf(m)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Int, Int, Int, Int, Double)]
    val stream = mem.toDF().toDF("d0", "d1", "d2", "d3", "d4", "value")
    mem.addData((id(0, "2022"), id(1, "Mar"), id(2, "West"), id(3, "coupe"),
      id(4, "Sales"), 7.0))
    val q = graft.streaming.Streaming.ingestIntoZStore(cube, stream)
    q.awaitTermination(60000)
    // micro-batch landed through the encrypted append; files stay opaque
    Layout.zorderManifest(spark, dir).foreach(zf =>
      intercept[Exception] { spark.read.parquet(zf.path).collect() })
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(12.0))
  }

  test("ingestIntoZStore with orderCol resolves intra-batch conflicts deterministically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zorder_ocol", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 1.0)
    val dir = java.nio.file.Files.createTempDirectory("z14ocol").toString
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2))
    def id(d: Int, m: String) = cube.dimensions(d).idOf(m)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Int, Int, Int, Int, Double, Long)]
    val stream = mem.toDF().toDF("d0", "d1", "d2", "d3", "d4", "value", "seq")
    // same address twice in ONE batch, the higher offset carrying 777 —
    // max_by(value, seq) must pick it regardless of shuffle arrival order
    mem.addData(
      (id(0, "2022"), id(1, "Mar"), id(2, "West"), id(3, "coupe"),
        id(4, "Sales"), 100.0, 1L),
      (id(0, "2022"), id(1, "Mar"), id(2, "West"), id(3, "coupe"),
        id(4, "Sales"), 777.0, 2L))
    val q = graft.streaming.Streaming.ingestIntoZStore(cube, stream,
      orderCol = Some("seq"))
    q.awaitTermination(60000)
    assert(cube.get(Seq("2022", "Mar", "West", "coupe", "Sales")).contains(777.0))
  }
}
