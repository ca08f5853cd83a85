package graft

import graft.core.{Crypto, Database}
import graft.pipeline.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 operational-hardening pins (r14 verdict #2/#4/#6 + advice):
  *   - generation-numbered CREATE-EXCLUSIVE manifest commits — a lost race
  *     fails at the filesystem, a crashed commit's partial file is ignored
  *     by readers and recoverable by the next writer;
  *   - [[Layout.zorderVacuum]] retention windows (`keepGenerations`): a
  *     reader pinned on generation G−1 survives a vacuum keeping 2
  *     generations while G−2 files are reclaimed; opt-in auto-vacuum on
  *     the raw append path;
  *   - [[Database.rekey]] key rotation: old password fails loudly
  *     post-rotation, the new one serves, facts match; the z-store
  *     re-encrypt face ([[graft.core.Cube.compactToZorderedStore]] with
  *     new key material) plus vacuum reclaiming the old-key segments;
  *   - crypto.json durability (r14 advice, medium): atomic marker
  *     replacement, the previous marker covering old-key payloads until
  *     the re-save completes, and load-side recovery from every
  *     interrupted-save state;
  *   - PBKDF2 iteration hardening with recorded-count backward compat;
  *     key-material conf names that Spark's default redaction covers.
  */
class Round15FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def exists(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(
      new org.apache.hadoop.fs.Path(path).toUri.getPath))

  private def zbase(n: Int) = spark.range(n).select(col("id"),
    pmod(hash(col("id")), lit(16)).cast("long").as("a"),
    pmod(hash(col("id") * 7), lit(16)).cast("long").as("b"))
  private def zbatch(from: Long, n: Long) =
    spark.range(from, from + n).select(col("id"),
      (col("id") % 4).as("a"), (col("id") % 4).as("b"))
  private val zc = Seq(col("a"), col("b"))

  test("vacuum retention: a reader pinned on G-1 survives keepGenerations=2; G-2 reclaimed") {
    val dir = java.nio.file.Files.createTempDirectory("z15retain").toString
    Layout.zorderWrite(spark, dir, zbase(600), zc, bits = 4, numFiles = 4) // gen 1
    val st1 = Layout.zorderAppend(spark, dir, zbatch(5000, 40), zc, bits = 4) // gen 2
    val pinned = Layout.zorderRead(spark, dir) // plans over gen-2's file list
    val st2 = Layout.zorderAppend(spark, dir, zbatch(6000, 40), zc, bits = 4) // gen 3
    assert(st1.rewrittenFiles.nonEmpty && st2.rewrittenFiles.nonEmpty)
    Layout.zorderVacuum(spark, dir, keepGenerations = 2)
    // files dead since gen 2 (live only in gen 1) are gone…
    st1.rewrittenFiles.filterNot(st2.rewrittenFiles.toSet).foreach(p =>
      assert(!exists(p), s"keepGenerations=2 left a gen-1-only file: $p"))
    // …while everything gen 2 referenced survives: the pinned reader —
    // whose plan lists gen-2 files st2 killed — still evaluates
    st2.rewrittenFiles.foreach(p => assert(exists(p),
      s"keepGenerations=2 reclaimed a gen-2 file a pinned reader needs: $p"))
    assert(pinned.count() == 640L)
    assert(Layout.zorderRead(spark, dir).count() == 680L)
    // shrinking the window to 1 then reclaims gen-2's dead files too
    Layout.zorderVacuum(spark, dir, keepGenerations = 1)
    st2.rewrittenFiles.foreach(p => assert(!exists(p)))
    assert(Layout.zorderRead(spark, dir).count() == 680L)
  }

  test("time travel: as-of-generation snapshots, exact boundaries, vacuum evicts loudly") {
    val dir = java.nio.file.Files.createTempDirectory("z15tt").toString
    Layout.zorderWrite(spark, dir, zbase(600), zc, bits = 4, numFiles = 4) // gen 1
    Layout.zorderAppend(spark, dir, zbatch(5000, 40), zc, bits = 4) // gen 2
    Layout.zorderAppend(spark, dir, zbatch(6000, 40), zc, bits = 4) // gen 3
    // each snapshot reads exactly its commit's contents
    assert(Layout.zorderRead(spark, dir, asOfGeneration = Some(1L)).count() == 600L)
    assert(Layout.zorderRead(spark, dir, asOfGeneration = Some(2L)).count() == 640L)
    assert(Layout.zorderRead(spark, dir, asOfGeneration = Some(3L)).count() == 680L)
    // asking past the live generation serves the newest retained snapshot
    assert(Layout.zorderRead(spark, dir, asOfGeneration = Some(99L)).count() == 680L)
    assert(Layout.zorderManifestAsOf(spark, dir, 99L)._1 == 3L)
    // generation 0 was never committed → loud, at manifest selection
    intercept[NoSuchElementException](Layout.zorderManifestAsOf(spark, dir, 0L))
    // vacuum keeping 2 generations: gen-2/3 snapshots stay READABLE
    // end-to-end (their files are the retention window's contract),
    // gen 1 now fails at selection, not mid-scan
    Layout.zorderVacuum(spark, dir, keepGenerations = 2)
    assert(Layout.zorderRead(spark, dir, asOfGeneration = Some(2L)).count() == 640L)
    assert(Layout.zorderRead(spark, dir, asOfGeneration = Some(3L)).count() == 680L)
    intercept[NoSuchElementException](
      Layout.zorderRead(spark, dir, asOfGeneration = Some(1L)))
  }

  test("raw append auto-vacuum: opt-in, one-append grace, refuses a graceless window") {
    val dir = java.nio.file.Files.createTempDirectory("z15autovac").toString
    Layout.zorderWrite(spark, dir, zbase(600), zc, bits = 4, numFiles = 4)
    intercept[IllegalArgumentException] {
      Layout.zorderAppend(spark, dir, zbatch(5000, 10), zc, bits = 4,
        autoVacuumKeepGenerations = Some(1)) // would race its own pinned readers
    }
    val st1 = Layout.zorderAppend(spark, dir, zbatch(5000, 40), zc, bits = 4,
      autoVacuumKeepGenerations = Some(2))
    // the files THIS append killed survive its own vacuum (grace)…
    st1.rewrittenFiles.foreach(p => assert(exists(p)))
    val st2 = Layout.zorderAppend(spark, dir, zbatch(6000, 40), zc, bits = 4,
      autoVacuumKeepGenerations = Some(2))
    // …and the streaming caller's steady state never accumulates: files
    // dead for two commits are reclaimed by the next append, no manual
    // vacuum anywhere
    st1.rewrittenFiles.filterNot(st2.rewrittenFiles.toSet).foreach(p =>
      assert(!exists(p), s"auto-vacuum never reclaimed: $p"))
    assert(Layout.zorderRead(spark, dir).count() == 680L)
  }

  test("a crashed commit's partial manifest: readers skip it, the next writer recovers") {
    val dir = java.nio.file.Files.createTempDirectory("z15partial").toString
    Layout.zorderWrite(spark, dir, zbase(400), zc, bits = 4, numFiles = 4)
    assert(Layout.zorderGeneration(spark, dir) == 1L)
    // forge the debris a writer crashed mid-write would leave: a gen-2
    // manifest file with NO #end terminator
    val debris = java.nio.file.Paths.get(dir, f"_zmanifest.g${2L}%019d")
    java.nio.file.Files.writeString(debris,
      "#zgen\t2\n/nonexistent/file.parquet\t0\t1\t5\n")
    // readers never select the partial file
    assert(Layout.zorderGeneration(spark, dir) == 1L)
    assert(Layout.zorderRead(spark, dir).count() == 400L)
    // the next append at this generation clears the debris and commits
    val st = Layout.zorderAppend(spark, dir, zbatch(5000, 30), zc, bits = 4)
    assert(st.batchRows == 30L)
    assert(Layout.zorderGeneration(spark, dir) == 2L)
    assert(Layout.zorderRead(spark, dir).count() == 430L)
  }

  test("a racing commit inside the narrowest window fails at the create-exclusive") {
    val dir = java.nio.file.Files.createTempDirectory("z15excl").toString
    Layout.zorderWrite(spark, dir, zbase(400), zc, bits = 4, numFiles = 4)
    val manifest = Layout.zorderManifest(spark, dir)
    val racer = java.nio.file.Paths.get(dir, f"_zmanifest.g${2L}%019d")
    // the racer lands AFTER this writer's generation pre-check passed —
    // the window the r14 check-then-rename scheme lost silently; now the
    // create(overwrite=false) on the generation-named file refuses it
    Layout.manifestCreateSeam = () => {
      Layout.manifestCreateSeam = () => ()
      java.nio.file.Files.writeString(racer, ("#zgen\t2" +:
        manifest.map(zf => s"${zf.path}\t${zf.zMin}\t${zf.zMax}\t${zf.rows}") :+
        "#end").mkString("\n"))
      ()
    }
    try {
      intercept[Layout.StaleManifestException] {
        Layout.zorderAppend(spark, dir, zbatch(5000, 30), zc, bits = 4)
      }
    } finally Layout.manifestCreateSeam = () => ()
    // the racer's committed state stands untouched
    assert(Layout.zorderGeneration(spark, dir) == 2L)
    assert(Layout.zorderRead(spark, dir).count() == 400L)
  }

  test("rekey: old password fails loudly, new serves, facts hash-match") {
    val db = TinyModel.build(spark)
    db.cube("sales").set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    db.cube("sales").set(Seq("2021", "Feb", "South", "sedan", "Sales"), 456.0)
    val dir = java.nio.file.Files.createTempDirectory("graft_rekey").toString
    val oldPw = new Crypto.AesGcm("first password")
    val newPw = new Crypto.AesGcm("rotated password")
    db.save(dir, oldPw)
    val wantRows = Database.load(dir, spark, oldPw).cube("sales").facts
      .orderBy("d0", "d1", "d2", "d3", "d4").collect().toSeq
    Database.rekey(dir, spark, oldPw, newPw)
    // old password now fails LOUDLY (metadata GCM tag)
    intercept[IllegalArgumentException] {
      Database.load(dir, spark, oldPw)
    }
    // no rekey staging residue next to the store
    val parent = java.nio.file.Paths.get(dir).toAbsolutePath.getParent
    val base = java.nio.file.Paths.get(dir).getFileName.toString
    val residue = java.nio.file.Files.list(parent).toArray.map(_.toString)
      .filter(_.contains(s"$base.rekey-"))
    assert(residue.isEmpty, s"rekey left staging dirs behind: ${residue.mkString(", ")}")
    // the new password serves the SAME facts, and the rollup agrees
    val rotated = Database.load(dir, spark, newPw)
    val gotRows = rotated.cube("sales").facts
      .orderBy("d0", "d1", "d2", "d3", "d4").collect().toSeq
    assert(gotRows == wantRows, "facts changed across rekey")
    assert(rotated.cube("sales")
      .get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(579.0))
  }

  test("z-store re-encrypt face: new key serves, vacuum reclaims old-key segments") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zrekey", c0.dimensions, spark, None)
    cube.cacheEnabled = false
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 100.0)
    cube.set(Seq("2021", "Feb", "South", "sedan", "Sales"), 50.0)
    val dir = java.nio.file.Files.createTempDirectory("z15zrekey").toString
    val encOld = Crypto.parquetEncryption("zstore-old",
      new Crypto.AesGcm("old key").deriveKey("saltsaltsaltsalt".getBytes))
    val encNew = Crypto.parquetEncryption("zstore-new",
      new Crypto.AesGcm("new key").deriveKey("SALTSALTSALTSALT".getBytes))
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2,
      encryption = Some(encOld)))
    val oldFiles = Layout.zorderManifest(spark, dir).map(_.path)
    // re-encrypt in place: a fresh compact against the same store dir with
    // NEW key material — the store re-layouts under the new key and
    // commits the next generation
    assert(cube.compactToZorderedStore(dir, Seq(0, 1), files = 2,
      encryption = Some(encNew)))
    val newFiles = Layout.zorderManifest(spark, dir).map(_.path)
    assert(newFiles.toSet.intersect(oldFiles.toSet).isEmpty)
    // rollup unchanged through the rotation
    assert(cube.get(Seq("All years", "Year", "Total", "Total", "Sales"))
      .contains(150.0))
    // the old-key options cannot read the new files (key id mismatch is a
    // loud KeyAccessDenied, never plaintext). parquet-mr's KEK read cache
    // would short-circuit this within its ~10-min TTL (the successful
    // new-key read above cached the KEKs) — cleared first, as a fresh JVM
    // (the real attack surface: an operator holding only the retired
    // password) would be
    org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    intercept[Exception] {
      spark.read.options(encOld._2).parquet(newFiles: _*).collect()
    }
    // vacuum reclaims the old-key generation entirely
    Layout.zorderVacuum(spark, dir, keepGenerations = 1)
    oldFiles.foreach(p => assert(!exists(p), s"old-key segment survived: $p"))
    assert(spark.read.options(encNew._2).parquet(newFiles: _*).count() == 2L)
  }

  test("interrupted re-save states: both markers unlock, marker-only state recovers") {
    val db = TinyModel.build(spark)
    db.cube("sales").set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 11.0)
    val pw = new Crypto.AesGcm("same password")
    val dir = java.nio.file.Files.createTempDirectory("graft_resave").toString
    db.save(dir, pw)
    val marker1 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/crypto.json"))
    // a COMPLETED re-save leaves no .prev residue and a fresh salt
    db.save(dir, pw)
    val marker2 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/crypto.json"))
    assert(marker1 != marker2, "re-save must re-salt")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/crypto.json.prev")),
      "completed save left crypto.json.prev behind")
    // forge the crash state the r14 advice names: the NEW marker landed
    // (with the old one preserved as .prev) but the payloads are still the
    // OLD key's — here: marker2's payloads with a forged "newer" marker
    val pw3 = new Crypto.AesGcm("same password") // same password, new salt
    val salt3 = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt3)
    val key3 = pw3.deriveKey(salt3)
    val digest3 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key3).take(8).map("%02x".format(_)).mkString
    val forged = s"""{"method":"aes-gcm","salt":"${java.util.Base64.getUrlEncoder.encodeToString(salt3)}","iterations":${pw3.iterations},"keyId":"graft-forged-$digest3"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/crypto.json.prev"), marker2)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/crypto.json"), forged)
    // load merges key material from BOTH markers: the old-key parquet
    // decrypts through .prev while the primary marker stands
    val probe = Seq("2021", "Year", "Total", "Total", "Sales")
    assert(Database.load(dir, spark, pw).cube("sales").get(probe)
      .contains(11.0))
    // the EARLIER crash state — old marker moved to .prev, new one never
    // written — loads under .prev with a loud warning
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/crypto.json"))
    assert(Database.load(dir, spark, pw).cube("sales").get(probe)
      .contains(11.0))
  }

  test("interrupted PLAIN re-save over an encrypted store: every crash state loads") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val db = TinyModel.build(spark)
    db.cube("sales").set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 21.0)
    val pw = new Crypto.AesGcm("pw15")
    val dir = Files.createTempDirectory("graft_plainover").toString
    val probe = Seq("2021", "Year", "Total", "Total", "Sales")
    db.save(dir, pw)
    val cryptoPath = Paths.get(s"$dir/crypto.json")
    val cryptoPrev = Paths.get(s"$dir/crypto.json.prev")
    val aesMarker = Files.readString(cryptoPath)
    // State A: crash right after the marker swap of save(dir) — the
    // {"method":"none"} TARGET marker landed, prev carries the aes
    // vintage, every payload is still old-encrypted
    Files.move(cryptoPath, cryptoPrev, StandardCopyOption.ATOMIC_MOVE)
    Files.writeString(cryptoPath, """{"method":"none"}""")
    // a plain load fails LOUDLY (meta is still ciphertext, and the WARNING
    // names the way out) — never a silent garbage parse
    intercept[Exception](Database.load(dir, spark))
    // the TRANSITION load under the previous encryptor serves everything
    assert(Database.load(dir, spark, pw).cube("sales").get(probe)
      .contains(21.0))
    // a save over the mid-transition dir refuses (leftover .prev = an
    // unrewritten vintage whose salt record must not be overwritten)
    intercept[IllegalArgumentException](db.save(dir))
    // operator recovery: clear the stale markers explicitly, then re-save
    Files.delete(cryptoPath); Files.delete(cryptoPrev)
    // State B: crash after all payloads landed plain but before the two
    // marker deletes — both markers present, store fully plaintext
    db.save(dir) // completes: clears both markers
    assert(!Files.exists(cryptoPath) && !Files.exists(cryptoPrev),
      "a completed plain re-save must clear both markers")
    Files.writeString(cryptoPath, """{"method":"none"}""")
    Files.writeString(cryptoPrev, aesMarker)
    assert(Database.load(dir, spark).cube("sales").get(probe).contains(21.0))
  }

  test("first-time encryption over a plain store: crash state loads; dirty prev refuses saves") {
    import java.nio.file.{Files, Paths}
    val db = TinyModel.build(spark)
    db.cube("sales").set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 31.0)
    val dir = Files.createTempDirectory("graft_firstenc").toString
    val probe = Seq("2021", "Year", "Total", "Total", "Sales")
    db.save(dir) // plain, canonical: no markers
    // simulate save(dir, aes) crashing right after both markers landed
    // and before any payload rewrite: prev records the PLAIN vintage
    // (what the save-side cover now writes), cur claims the aes target
    Files.writeString(Paths.get(s"$dir/crypto.json.prev"), """{"method":"none"}""")
    Files.writeString(Paths.get(s"$dir/crypto.json"), """{"method":"aes-gcm"}""")
    // the NoEncryption TRANSITION load mounts the still-plain payloads
    assert(Database.load(dir, spark).cube("sales").get(probe).contains(31.0))
    // a save over the mid-transition dir REFUSES — two marker slots
    // cannot represent three vintages, and overwriting .prev would
    // destroy the only salt record of an unrewritten vintage
    intercept[IllegalArgumentException](db.save(dir, new Crypto.AesGcm("x")))
    intercept[IllegalArgumentException](db.save(dir))
  }

  test("PBKDF2 hardening: 600k default, recorded-count backward compat, redactable conf names") {
    // token written under ANY explicit count decrypts with a
    // default-count decryptor (the token records its count)…
    val writer = new Crypto.AesGcm("pw", iterations = 2000)
    val reader = new Crypto.AesGcm("pw")
    assert(reader.iterations == 600000)
    assert(reader.decrypt(writer.encrypt("hello")) == "hello")
    // …and vice versa
    assert(writer.decrypt(reader.encrypt("world")) == "world")
    // a database saved under an older/explicit count loads with a
    // default-count encryptor: load honors crypto.json's recorded count
    val db = TinyModel.build(spark)
    db.cube("sales").set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 7.0)
    val dir = java.nio.file.Files.createTempDirectory("graft_iters").toString
    db.save(dir, new Crypto.AesGcm("pw", iterations = 2000))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/crypto.json")).contains("2000"))
    assert(Database.load(dir, spark, new Crypto.AesGcm("pw")).cube("sales")
      .get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(7.0))
    // key material travels under a name Spark's DEFAULT redaction regex
    // covers — plan descriptions/event logs redact it without opt-in conf
    val defaultRedaction = "(?i)secret|password|token|access[.]key".r
    assert(defaultRedaction.findFirstIn(Crypto.KeyConfPrefix + "anykey").isDefined,
      s"'${Crypto.KeyConfPrefix}' escapes Spark's default redaction regex")
  }
}
