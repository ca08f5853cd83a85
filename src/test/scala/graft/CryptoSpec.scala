package graft

import graft.core.{Crypto, Database}
import org.scalatest.funsuite.AnyFunSuite

/** At-rest encryption (≙ reference `encryption.py` ×
  * `storage/sqlite.py:313-421`): string-codec roundtrips per tier, and the
  * full database save/load trip where metadata encrypts via the codec and
  * fact parquet via parquet modular encryption — with the failure shapes
  * pinned LOUD (plain load of an encrypted dir, wrong password, keyless
  * parquet read all throw; nothing ever parses garbage).
  */
class CryptoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AES-GCM string codec: roundtrip, randomized tokens, loud failures") {
    val enc = new Crypto.AesGcm("s3cret")
    val msg = "grüße ✓ 漢字 — rule ASTs & weights 3.14"
    val t1 = enc.encrypt(msg)
    val t2 = enc.encrypt(msg)
    assert(enc.decrypt(t1) == msg && enc.decrypt(t2) == msg)
    assert(t1 != t2, "salted tokens must differ per encryption")
    assert(!t1.contains("rule"), "ciphertext must not leak plaintext")
    // wrong password: GCM tag verification fails loudly
    intercept[IllegalArgumentException] {
      new Crypto.AesGcm("wrong").decrypt(t1)
    }
    // tampered ciphertext fails loudly
    val bytes = java.util.Base64.getUrlDecoder.decode(t1)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException] {
      enc.decrypt(java.util.Base64.getUrlEncoder.encodeToString(bytes))
    }
  }

  test("property: every string roundtrips through both codecs (seeded)") {
    val rnd = new scala.util.Random(42)
    // explicit low iteration count: 200 roundtrips × the 600k default would
    // spend ~2 min in PBKDF2 alone; the tunable path is itself under test
    val aes = new Crypto.AesGcm("pw π", iterations = 1000)
    val obf = new Crypto.Obfuscator("öbfüscate")
    (1 to 200).foreach { _ =>
      // adversarial alphabet: control chars, astral-plane, combining marks
      val s = (0 until rnd.nextInt(80)).map(_ => rnd.nextInt(5) match {
        case 0 => rnd.nextPrintableChar().toString
        case 1 => new String(Character.toChars(0x1F600 + rnd.nextInt(80)))
        case 2 => "́" // combining acute
        case 3 => (rnd.nextInt(31) + 1).toChar.toString // control
        case _ => "汉字ß"
      }).mkString
      assert(aes.decrypt(aes.encrypt(s)) == s, s"aes broke on: ${s.take(40)}")
      assert(obf.decrypt(obf.encrypt(s)) == s, s"obf broke on: ${s.take(40)}")
    }
  }

  test("obfuscator: roundtrip incl. unicode; not plaintext; not secure by contract") {
    val enc = new Crypto.Obfuscator("pw")
    val msg = """{"name":"tiny","dims":["années","月"]}"""
    val t = enc.encrypt(msg)
    assert(t != msg && !t.contains("tiny"))
    assert(enc.decrypt(t) == msg)
    assert(Crypto.NoEncryption.encrypt(msg) == msg)
  }

  test("encrypted save/load: parquet modular encryption end to end") {
    val db = TinyModel.build(spark)
    db.cube("sales").set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    db.cube("sales").set(Seq("2021", "Feb", "South", "sedan", "Sales"), 456.0)
    val dir = java.nio.file.Files.createTempDirectory("graft_enc").toString
    val pw = new Crypto.AesGcm("open sesame")
    val want = db.cube("sales").get(Seq("2021", "Year", "Total", "Total", "Sales"))
    assert(want.contains(579.0))
    db.save(dir, pw)
    // metadata is ciphertext, and the marker records the method
    val metaRaw = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/meta.json"))
    assert(!metaRaw.contains("dimensions") && !metaRaw.contains("sales"),
      "meta.json must not be plaintext")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/crypto.json")).contains("aes-gcm"))
    // fact parquet is UNREADABLE without the key: the footer itself is
    // encrypted, so even the schema never leaks
    val ex = intercept[Exception] {
      spark.read.parquet(s"$dir/cubes/sales").collect()
    }
    assert(ex.toString.toLowerCase.contains("crypt") ||
      ex.getCause != null && ex.getCause.toString.toLowerCase.contains("crypt"),
      s"keyless read must fail on crypto, got: $ex")
    // a plain load is refused loudly, naming what it needs
    val plain = intercept[IllegalArgumentException] {
      Database.load(dir, spark)
    }
    assert(plain.getMessage.contains("aes-gcm"))
    // a wrong password is refused loudly (GCM tag on the metadata)
    intercept[IllegalArgumentException] {
      Database.load(dir, spark, new Crypto.AesGcm("not it"))
    }
    // the right password round-trips: facts decrypt in-executor, rollup
    // equals the original model's
    val loaded = Database.load(dir, spark, pw)
    assert(loaded.cube("sales")
      .get(Seq("2021", "Year", "Total", "Total", "Sales")) == want)
  }

  test("obfuscation tier: metadata-only by contract; plain re-save clears the marker") {
    val db = TinyModel.build(spark)
    db.cube("sales").set(Seq("2022", "Mar", "West", "coupe", "Sales"), 77.0)
    val dir = java.nio.file.Files.createTempDirectory("graft_obf").toString
    val probe = Seq("2022", "Year", "Total", "Total", "Sales")
    assert(db.cube("sales").get(probe).contains(77.0))
    db.save(dir, new Crypto.Obfuscator("pw"))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/crypto.json")).contains("obfuscation"))
    // fact parquet stays PLAIN at this tier (its loud contract)
    assert(spark.read.parquet(s"$dir/cubes/sales").count() == 1)
    val loaded = Database.load(dir, spark, new Crypto.Obfuscator("pw"))
    assert(loaded.cube("sales").get(probe).contains(77.0))
    // re-saving PLAIN over the encrypted dir must clear the stale marker
    // (the ORIGINAL db re-saves — a loaded db's frames read from the dir
    // itself and cannot overwrite what they scan)
    db.save(dir)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/crypto.json")))
    assert(Database.load(dir, spark).cube("sales").get(probe).contains(77.0))
  }
}
