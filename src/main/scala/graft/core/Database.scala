package graft.core

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._
import java.nio.file.{Files, Paths}

/** Root catalog: named dimensions + cubes (≙ `database.py:28`).
  * Persistence is Parquet per cube + a JSON metadata sidecar (the Spark-native
  * replacement for the reference's SQLite KV store, `storage/sqlite.py` —
  * SURVEY §2.1 S5/S7).
  */
final class Database(val name: String, val spark: SparkSession) {
  private val dims = scala.collection.mutable.LinkedHashMap[String, Dimension]()
  private val cubeMap = scala.collection.mutable.LinkedHashMap[String, Cube]()

  /** Free-text metadata (≙ `database.py:162-170`). */
  @volatile var description: String = ""

  def addDimension(dimName: String): Dimension = {
    require(!dims.contains(dimName.toLowerCase), s"dimension '$dimName' exists")
    val d = new Dimension(dimName); dims(dimName.toLowerCase) = d; d
  }

  /** Register a DEGENERATE dimension (see [[Dimension.degenerate]]): members
    * are the fact-column values themselves — the unbounded-cardinality path
    * past the driver-catalog boundary (ARCHITECTURE §7).
    */
  def addDegenerateDimension(dimName: String, prefix: String = "",
      allName: String = "All"): Dimension = {
    require(!dims.contains(dimName.toLowerCase), s"dimension '$dimName' exists")
    val d = Dimension.degenerate(dimName, prefix, allName)
    dims(dimName.toLowerCase) = d; d
  }
  def dimension(dimName: String): Dimension = dims(dimName.toLowerCase)
  def dimensions: Seq[Dimension] = dims.values.toSeq
  def dimensionExists(dimName: String): Boolean = dims.contains(dimName.toLowerCase)

  /** Remove a dimension not used by any cube (≙ `database.py:444-465`). */
  def removeDimension(dimName: String): Unit = {
    val d = dims.getOrElse(dimName.toLowerCase,
      throw new NoSuchElementException(s"unknown dimension '$dimName'"))
    val users = cubeMap.values.filter(_.dimensions.exists(_ eq d)).map(_.name)
    require(users.isEmpty,
      s"dimension '$dimName' is used by cube(s) ${users.mkString(", ")} — remove them first")
    dims.remove(dimName.toLowerCase)
  }

  def addCube(cubeName: String, cubeDims: Seq[Dimension]): Cube = {
    require(!cubeMap.contains(cubeName.toLowerCase), s"cube '$cubeName' exists")
    val c = new Cube(cubeName, cubeDims, spark)
    c.cacheEnabled = cachingFlag
    c.databaseRef = Some(this)
    cubeMap(cubeName.toLowerCase) = c; c
  }
  def addCube(cubeName: String, cubeDims: Seq[Dimension],
      facts: org.apache.spark.sql.DataFrame): Cube = {
    require(!cubeMap.contains(cubeName.toLowerCase), s"cube '$cubeName' exists")
    val c = new Cube(cubeName, cubeDims, spark, Some(facts))
    c.cacheEnabled = cachingFlag
    c.databaseRef = Some(this)
    cubeMap(cubeName.toLowerCase) = c; c
  }
  /** Register an externally-constructed cube — e.g. a materialized
    * aggregate summary (`graft.olap.Aggregates.materialize`) — under its
    * name, so the dialect (`SELECT … FROM <name>`), the cell passthroughs
    * and cross-cube rule refs can address it. Registered cubes are
    * SESSION-SCOPE: their dimensions deliberately shadow base dimension
    * names and never enter the dimension registry, so [[save]] skips them
    * (persisting by dim NAME would silently rebind them to the base
    * hierarchy on load) — rebuild and re-register after a load. EXCEPTION:
    * registered cubes that carry Aggregates summary meta round-trip through
    * [[save]]/[[Database.load]] — their grain re-derives the dims
    * deterministically, so reattachment is safe and pays no base scan.
    */
  def registerCube(c: Cube): Cube = {
    require(!cubeMap.contains(c.name.toLowerCase), s"cube '${c.name}' exists")
    c.cacheEnabled = cachingFlag
    c.databaseRef = Some(this)
    transientCubes += c.name.toLowerCase
    cubeMap(c.name.toLowerCase) = c; c
  }
  private val transientCubes = scala.collection.mutable.Set[String]()
  private def persistentCubes: Seq[Cube] =
    cubeMap.values.filterNot(c => transientCubes(c.name.toLowerCase)).toSeq

  def cube(cubeName: String): Cube = cubeMap.getOrElse(cubeName.toLowerCase,
    throw new NoSuchElementException(s"unknown cube '$cubeName'"))

  /** Aggregate navigator over every registered summary of `cubeName`,
    * smallest first (the navigator's first-covering-wins contract wants the
    * coarsest grain up front). Size proxy: the derived catalog
    * cross-product — driver-known, no count job; a kept-at-leaf degenerate
    * dimension counts as unbounded. Composes with [[save]]/[[load]]: a
    * freshly loaded database serves `db.navigator("sales").get(...)`
    * immediately, summaries included.
    */
  def navigator(cubeName: String): graft.olap.Aggregates.Navigator = {
    val base = cube(cubeName)
    val sums = cubeMap.values.toSeq
      .filter(c => (c ne base) && graft.olap.Aggregates.metaOf(c)
        .exists(_.baseName.equalsIgnoreCase(base.name)))
      .sortBy(_.dimensions.map(d =>
        if (d.isDegenerate) 2e9 else d.members.size.toDouble).product)
    new graft.olap.Aggregates.Navigator(base, sums)
  }

  /** Replace a REGISTERED (transient) cube under its name — the refresh
    * cycle for registry-held summaries, whose refresh/rebuild return NEW
    * cube objects. Persistent cubes are not replaceable this way. */
  def replaceRegistered(c: Cube): Cube = {
    val key = c.name.toLowerCase
    require(transientCubes(key),
      s"cube '${c.name}' is not a registered transient cube — cannot replace")
    c.cacheEnabled = cachingFlag
    c.databaseRef = Some(this)
    cubeMap(key) = c; c
  }

  /** Refresh every registered summary of `cubeName` against the current
    * base state (partial refresh when the write log can name what changed,
    * rebuild otherwise), RE-REGISTERING the refreshed cubes under their
    * names, and return a navigator over the result. Without this, one base
    * write would park the registry's summaries forever: the navigator
    * would route every read to base, and [[save]] would silently drop the
    * stale summaries from the next session's model.
    */
  def refreshSummaries(cubeName: String): graft.olap.Aggregates.Navigator = {
    import graft.olap.Aggregates
    val base = cube(cubeName)
    cubeMap.values.toSeq
      .filter(c => (c ne base) && Aggregates.metaOf(c)
        .exists(_.baseName.equalsIgnoreCase(base.name)))
      .foreach { sc =>
        if (!Aggregates.metaOf(sc).exists(_.builtVersion == base.currentStateVersion))
          replaceRegistered(Aggregates.refreshPartial(base, sc)
            .getOrElse(Aggregates.rebuild(base, sc)))
      }
    navigator(cubeName)
  }
  def cubes: Seq[Cube] = cubeMap.values.toSeq
  def cubeExists(cubeName: String): Boolean = cubeMap.contains(cubeName.toLowerCase)

  /** Cell read/write passthrough (≙ `database.py:573-600`). */
  def get(cubeName: String, address: Seq[String]): Option[Double] = cube(cubeName).get(address)
  def set(cubeName: String, address: Seq[String], value: Double): Unit =
    cube(cubeName).set(address, value)

  /** Database-wide caching switch (≙ `database.py:196-237`): toggles every
    * existing cube's result cache (disabling also drops current entries)
    * AND applies to cubes added later.
    */
  private var cachingFlag = true
  def caching: Boolean = cachingFlag
  def caching_=(on: Boolean): Unit = {
    cachingFlag = on
    cubeMap.values.foreach { c =>
      c.cacheEnabled = on
      if (!on) c.clearCache()
    }
  }

  /** Expose the whole model to `spark.sql`: per cube `<cube>_facts`, per
    * dimension `<dim>_members` (id, name, level, format) and
    * `<dim>_closure` (anc, leaf, weight) — so any Spark SQL client can run
    * rollups as plain SQL joins over the same frames the engine plans.
    */
  def registerTempViews(): Unit = {
    cubeMap.values.foreach { c =>
      c.facts.createOrReplaceTempView(s"${c.name}_facts")
      // a TRANSIENT cube's derived dimensions deliberately shadow base
      // dimension names — registering them would overwrite the base
      // `<dim>_members`/`<dim>_closure` views; its facts view is enough
      val skipDims = transientCubes(c.name.toLowerCase)
      c.dimensions.zipWithIndex.foreach { case (d, i) =>
        // degenerate dimensions have neither a member catalog nor a closure
        // (their members are the fact column itself) — nothing to register
        if (!d.isDegenerate && !skipDims) {
          val rows = d.members.map(m =>
            org.apache.spark.sql.Row(m.id, m.name, m.level, m.format.orNull))
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("level", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("format", org.apache.spark.sql.types.StringType)))
          spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), schema)
            .createOrReplaceTempView(s"${d.name}_members")
          c.closureDf(i).createOrReplaceTempView(s"${d.name}_closure")
        }
      }
    }
  }

  // ---- persistence (S5/S6/S7) --------------------------------------------

  /** Save: `<dir>/meta.json` + `<dir>/cubes/<name>/` parquet. */
  def save(dir: String): Unit = save(dir, Crypto.NoEncryption)

  /** [[save]] with AT-REST ENCRYPTION (≙ reference `encryption.py` +
    * `storage/sqlite.py:313-421`): metadata JSON encrypts through the
    * encryptor's string codec; at the [[Crypto.AesGcm]] tier the fact
    * parquet additionally writes with parquet MODULAR ENCRYPTION (every
    * column + footer AES-GCM under a PBKDF2-derived master key, wrapped
    * in-executor by [[GraftKmsClient]] — no re-read, no driver bottleneck,
    * the 100 TB shape). A plaintext `crypto.json` records method + salt +
    * iterations (the salt is public, exactly like the reference's
    * embedded-salt Fernet tokens); the password exists only in the
    * caller's encryptor. [[Crypto.Obfuscator]] obfuscates METADATA ONLY
    * (its own loud contract); fact data at that tier stays plain.
    */
  def save(dir: String, encryptor: Crypto.Encryptor): Unit = {
    Files.createDirectories(Paths.get(dir))
    val (pqOpts, cryptoJson): (Map[String, String], Option[JValue]) =
      encryptor match {
        case aes: Crypto.AesGcm =>
          val salt = new Array[Byte](16)
          new java.security.SecureRandom().nextBytes(salt)
          val key = aes.deriveKey(salt)
          // keyId must be 1:1 with the DERIVED KEY, not the database name:
          // parquet-mr statically caches KMS clients and KEKs per instance
          // id (= keyId) for ~10 min, so a second save under the same id
          // with a fresh salt would WRAP its files with the cached previous
          // key while recording the new salt — permanently undecryptable
          // after a JVM restart. A key digest in the id makes the cache key
          // and the key material agree by construction.
          val digest = java.security.MessageDigest.getInstance("SHA-256")
            .digest(key).take(8).map("%02x".format(_)).mkString
          val keyId = s"graft-${name.toLowerCase}-$digest"
          val keyB64 = java.util.Base64.getEncoder.encodeToString(key)
          val cj: JValue = ("method" -> aes.method) ~
            ("salt" -> java.util.Base64.getUrlEncoder.encodeToString(salt)) ~
            ("iterations" -> aes.iterations) ~ ("keyId" -> keyId)
          (Crypto.parquetWriteOptions(keyId, keyB64), Some(cj))
        case Crypto.NoEncryption =>
          // PLAIN save over a previously-marked dir: write an explicit
          // {"method":"none"} TRANSITION marker (cleared again on success)
          // — without it, a crash mid-rewrite would leave crypto.json.prev
          // as the ONLY marker, claiming the whole store is still
          // encrypted while some payloads are already plaintext; load
          // could then satisfy neither encryptor (r15 review finding)
          val marked = Files.exists(Paths.get(s"$dir/crypto.json"))
          (Map.empty[String, String],
            if (marked) Some(("method" -> Crypto.NoEncryption.method): JValue)
            else None)
        case other => (Map.empty[String, String],
          Some(("method" -> other.method): JValue))
      }
    // crypto.json FIRST: it is the only record of the master-key salt — a
    // crash after the encrypted parquet writes but before this marker
    // would lose the salt and make the written facts permanently
    // unrecoverable (the in-memory salt dies with the JVM). Durability on
    // a RE-save (r14 advice, medium): the marker lands via temp-file +
    // ATOMIC_MOVE (never a truncate-in-place), and the PREVIOUS marker is
    // preserved as crypto.json.prev until every new payload has fully
    // landed — a crash mid-save leaves old-key parquet paired with the
    // old salt still on disk ([[Database.load]] merges key material from
    // both markers), instead of permanently undecryptable files.
    val cryptoPath = Paths.get(s"$dir/crypto.json")
    val cryptoPrev = Paths.get(s"$dir/crypto.json.prev")
    // a leftover .prev means an EARLIER save was interrupted and payloads
    // of that vintage may still be on disk — overwriting the .prev slot
    // here would destroy the only record of that vintage's salt (two
    // marker slots cannot represent three vintages; r15 review finding:
    // a crashed retry-save would otherwise permanently lose data). Refuse
    // loudly; the recovery path is to load under the matching encryptor
    // and save to a FRESH directory.
    require(!Files.exists(cryptoPrev),
      s"$dir is mid-transition from an interrupted save (crypto.json.prev " +
        "present) — recover FIRST: load under the encryptor that still " +
        "mounts it and save to a fresh directory (or, if the store is " +
        "known fully re-written, delete the stale markers explicitly)")
    if (Files.exists(cryptoPath)) {
      Files.move(cryptoPath, cryptoPrev,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else if (cryptoJson.isDefined &&
        Files.exists(Paths.get(s"$dir/meta.json"))) {
      // FIRST-TIME encryption of a previously-saved PLAIN store: record
      // the plain vintage as the previous marker, so a crash mid-save
      // (aes marker landed, payloads still plaintext) leaves a store the
      // NoEncryption transition load still mounts (r15 review finding —
      // the encrypted→plain direction had this cover, plain→encrypted
      // did not)
      val tmp = Files.createTempFile(Paths.get(dir), ".crypto", ".tmp")
      Files.writeString(tmp, JsonMethods.pretty(JsonMethods.render(
        ("method" -> Crypto.NoEncryption.method): JValue)))
      Files.move(tmp, cryptoPrev,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    cryptoJson.foreach { cj =>
      val tmp = Files.createTempFile(Paths.get(dir), ".crypto", ".tmp")
      Files.writeString(tmp, JsonMethods.pretty(JsonMethods.render(cj)))
      Files.move(tmp, cryptoPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    persistentCubes.foreach { c =>
      c.facts.write.options(pqOpts).mode("overwrite").parquet(s"$dir/cubes/${c.name}")
    }
    // Materialized aggregate SUMMARIES round-trip too: their grain-sized
    // facts land beside the cube frames and meta records (base, grain), so
    // a fresh load reattaches them via Aggregates.loadFrame without
    // re-paying the base scan — a summary whose EXISTENCE is session
    // folklore re-pays the 100 TB rebuild every session. Other registered
    // cubes stay session-scope (their dims shadow base names by design).
    val savedSummaries = cubeMap.values.toSeq
      .filter(c => transientCubes(c.name.toLowerCase))
      .flatMap(c => graft.olap.Aggregates.metaOf(c).map(m => (c, m)))
      .filter { case (c, m) =>
        val base = cubeMap.get(m.baseName.toLowerCase)
          .filter(b => !transientCubes(b.name.toLowerCase))
        val ok = base.isDefined
        if (!ok) System.err.println(s"[graft] WARNING: summary '${c.name}' " +
          s"references base '${m.baseName}' which is not a persistent cube " +
          "of this database — summary NOT saved")
        // a STALE summary must not be persisted: load anchors freshness to
        // the loaded base, which would silently promote stale cells to
        // fresh — refresh (or rebuild) before saving instead
        val fresh = base.exists(_.currentStateVersion == m.builtVersion)
        if (ok && !fresh) System.err.println(s"[graft] WARNING: summary " +
          s"'${c.name}' is STALE against base '${m.baseName}' — NOT saved; " +
          "refresh it (Aggregates.refreshPartial/rebuild) before save")
        ok && fresh
      }
    savedSummaries.foreach { case (c, _) =>
      c.facts.write.options(pqOpts).mode("overwrite").parquet(s"$dir/summaries/${c.name}")
    }
    val meta: JValue =
      ("name" -> name) ~
      ("dimensions" -> dims.values.map(dimToJson).toList) ~
      ("summaries" -> savedSummaries.map { case (c, m) =>
        ("name" -> c.name) ~ ("base" -> m.baseName) ~
          ("grain" -> m.grainLevels.map(g =>
            g.map(l => JInt(l): JValue).getOrElse(JNull)).toList)
      }.toList) ~
      ("cubes" -> persistentCubes.map(c => {
        // Scala on-entry functions cannot be serialized (no code pickling,
        // unlike ref `rules.py:45-88`) — warn LOUDLY instead of silently
        // resurrecting a no-op rule on load; Input-expr transforms persist.
        c.rules.filter(_.onEntryFn.nonEmpty).foreach(r => System.err.println(
          s"[graft] WARNING: rule '${r.name}' on cube '${c.name}' has a Scala " +
            "onEntryFn which is NOT persistable — it will be MISSING after load. " +
            "Express the transform as a RuleExpr using RuleExpr.Input to persist it."))
        ("name" -> c.name) ~ ("dims" -> c.dimensions.map(_.name).toList) ~
          ("rules" -> c.rules.filter(_.onEntryFn.isEmpty)
            .map(graft.olap.Rules.ruleToJson).toList) ~
          ("payloads" -> c.allPayloads.map { case (ids, p) =>
            ids.mkString(",") -> p }.toMap) ~
          ("views" -> JsonMethods.parse(c.views.toJson))
      }).toList)
    Files.writeString(Paths.get(s"$dir/meta.json"),
      encryptor.encrypt(JsonMethods.pretty(JsonMethods.render(meta))))
    // every payload (facts, summaries, meta) has landed — the previous
    // marker's transition cover is no longer needed; a plain save's
    // {"method":"none"} transition marker clears too (canonical plain
    // state carries no marker at all)
    Files.deleteIfExists(cryptoPrev)
    if (encryptor == Crypto.NoEncryption) Files.deleteIfExists(cryptoPath)
    ()
  }

  private def dimToJson(d: Dimension): JValue =
    ("name" -> d.name) ~
    ("degenerate" -> d.degenerateMode.map { case (prefix, allName) =>
      ("prefix" -> prefix) ~ ("all" -> allName): JValue }) ~
    ("members" -> d.members.map(m =>
      ("id" -> m.id) ~ ("name" -> m.name) ~
      ("parents" -> m.parents.toList) ~
      ("weights" -> m.parentWeights.map { case (k, v) => k.toString -> v }) ~
      ("format" -> m.format)).toList) ~
    ("attributes" -> d.attributeNames.map { an =>
      val f = d.attribute(an)
      ("name" -> f.name) ~ ("type" -> f.valueType) ~
      ("values" -> d.members.flatMap(m => f.get(m.id).map(v => m.id.toString -> v)).toMap)
    }.toList)

  /** Export/snapshot: full copy to a new directory (≙ `database.py:319-380`). */
  def export(dir: String): Unit = save(dir)

  /** [[export]] with at-rest encryption — see [[save(dir:String,encryptor*]]. */
  def export(dir: String, encryptor: Crypto.Encryptor): Unit = save(dir, encryptor)

  /** Snapshot inventory over a folder (≙ `SnapshotManager`, `snapshot.py:55`). */
  def snapshots(dir: String): SnapshotManager = new SnapshotManager(this, dir)
}

object Database {
  /** Load a database persisted by [[Database.save]]. */
  def load(dir: String, spark: SparkSession): Database =
    load(dir, spark, Crypto.NoEncryption)

  /** [[load]] of an ENCRYPTED database: the encryptor's method must match
    * the one recorded in the dir's `crypto.json` (a plain load of an
    * encrypted dir fails loudly, naming what it needs — never a silent
    * garbage parse), metadata decrypts through the string codec, and at
    * the AES tier the fact parquet reads re-derive the master key from
    * (password, recorded salt) and decrypt in-executor through the same
    * modular-encryption machinery that wrote them. A WRONG password fails
    * at key-unwrap/tag verification — loud, not garbage.
    */
  def load(dir: String, spark: SparkSession,
      encryptor: Crypto.Encryptor): Database = {
    implicit val fmts: Formats = DefaultFormats
    val cryptoPath = Paths.get(s"$dir/crypto.json")
    // crypto.json.prev survives only across an interrupted re-save (see
    // [[Database.save]]): before the new marker lands it IS the marker
    // (no payload was rewritten yet); afterwards its salt still unlocks
    // any old-key parquet the crashed save never got to overwrite
    val cryptoPrev = Paths.get(s"$dir/crypto.json.prev")
    val markerPath =
      if (Files.exists(cryptoPath)) Some(cryptoPath)
      else if (Files.exists(cryptoPrev)) {
        System.err.println(s"[graft] WARNING: $dir has crypto.json.prev but " +
          "no crypto.json — a re-save was interrupted before its new marker " +
          "landed; loading under the PREVIOUS marker")
        Some(cryptoPrev)
      } else None
    val rawMeta = Files.readString(Paths.get(s"$dir/meta.json"))
    def aesKeyEntry(aes: Crypto.AesGcm, cj: JValue): (String, String) = {
      val salt = java.util.Base64.getUrlDecoder.decode((cj \ "salt").extract[String])
      val iters = (cj \ "iterations").extract[Int]
      val keyId = (cj \ "keyId").extract[String]
      (keyId, java.util.Base64.getEncoder.encodeToString(aes.deriveKey(salt, iters)))
    }
    val (pqOpts, metaText): (Map[String, String], String) =
      markerPath match {
        case None =>
          require(encryptor == Crypto.NoEncryption,
            s"database at $dir is NOT encrypted (no crypto.json) but an " +
              s"'${encryptor.method}' encryptor was passed")
          (Map.empty, rawMeta)
        case Some(mp) =>
          val cj = JsonMethods.parse(Files.readString(mp))
          val method = (cj \ "method").extract[String]
          val prevJ = Option(cryptoPrev).filter(p =>
              (mp eq cryptoPath) && Files.exists(p))
            .map(p => JsonMethods.parse(Files.readString(p)))
          val prevMethod = prevJ.flatMap(pj => (pj \ "method").extractOpt[String])
          require(encryptor.method == method ||
              prevMethod.contains(encryptor.method),
            s"database at $dir is encrypted with method '$method' — pass the " +
              s"matching Crypto encryptor (got '${encryptor.method}')")
          if (encryptor.method == method) {
            val opts = encryptor match {
              case aes: Crypto.AesGcm =>
                val (keyId, keyB64) = aesKeyEntry(aes, cj)
                val primary = Crypto.parquetReadOptions(keyId, keyB64)
                // an interrupted re-save can leave a MIX of payload
                // vintages; each parquet file names its own key id, so
                // supplying the previous marker's derived key alongside
                // lets both decrypt
                val prevEntry = prevJ
                  .filter(pj => (pj \ "method").extractOpt[String].contains(method))
                  .map { pj =>
                    val (pid, pb64) = aesKeyEntry(aes, pj)
                    Crypto.KeyConfPrefix + pid -> pb64
                  }
                primary ++ prevEntry
              case _ =>
                if (prevMethod.exists(_ == "aes-gcm"))
                  System.err.println(s"[graft] WARNING: $dir carries a " +
                    s"'$method' marker with an interrupted re-save's " +
                    s"'${prevMethod.get}' previous marker — payloads the " +
                    "crashed save never rewrote are still under the old " +
                    "key; if the read fails, load with the PREVIOUS " +
                    "encryptor instead")
                Map.empty[String, String]
            }
            (opts, encryptor.decrypt(rawMeta))
          } else {
            // TRANSITION load (r15): an interrupted re-save toward
            // '$method' left this store mid-flight and the caller passed
            // the PREVIOUS vintage's encryptor — serve through the
            // previous marker's key material. meta.json may already be
            // the new vintage (a plain rewrite that landed before the
            // crash parses as JSON directly) or still the old one.
            System.err.println(s"[graft] WARNING: $dir is mid-transition " +
              s"to '$method' (interrupted re-save); loading under the " +
              s"PREVIOUS '${encryptor.method}' marker")
            val opts = encryptor match {
              case aes: Crypto.AesGcm =>
                val (pid, pb64) = aesKeyEntry(aes, prevJ.get)
                Crypto.parquetReadOptions(pid, pb64)
              case _ => Map.empty[String, String]
            }
            val text =
              if (method == Crypto.NoEncryption.method &&
                  JsonMethods.parseOpt(rawMeta).isDefined) rawMeta
              else encryptor.decrypt(rawMeta)
            (opts, text)
          }
      }
    val meta = JsonMethods.parse(metaText)
    val db = new Database((meta \ "name").extract[String], spark)
    (meta \ "dimensions").extract[List[JValue]].foreach { dj =>
      val degenerate = dj \ "degenerate" match {
        case JNothing | JNull => None
        case dg => Some(((dg \ "prefix").extract[String], (dg \ "all").extract[String]))
      }
      degenerate match {
        case Some((prefix, allName)) =>
          // degenerate dimensions round-trip as their (prefix, all) contract —
          // there are no members/attributes to restore
          db.addDegenerateDimension((dj \ "name").extract[String], prefix, allName)
        case None =>
      val d = db.addDimension((dj \ "name").extract[String])
      d.edit()
      val members = (dj \ "members").extract[List[JValue]]
      // two passes: create all names first (ids are assigned in order), then link
      members.foreach(mj => d.add((mj \ "name").extract[String]))
      members.foreach { mj =>
        val mname = (mj \ "name").extract[String]
        val weights = (mj \ "weights").extract[Map[String, Double]]
        (mj \ "parents").extract[List[Int]].foreach { pid =>
          val pname = members.find(x => (x \ "id").extract[Int] == pid)
            .map(x => (x \ "name").extract[String]).get
          d.add(pname, Seq(mname), Seq(weights.getOrElse(pid.toString, 1.0)))
        }
      }
      d.commit()
      members.foreach { mj =>
        (mj \ "format").extractOpt[String].foreach(f => d.setFormat((mj \ "name").extract[String], f))
      }
      (dj \ "attributes").extract[List[JValue]].foreach { aj =>
        val f = d.addAttribute((aj \ "name").extract[String], (aj \ "type").extract[String])
        (aj \ "values").extract[Map[String, String]].foreach { case (id, v) => f.set(id.toInt, v) }
      }
      }
    }
    (meta \ "cubes").extract[List[JValue]].foreach { cj =>
      val cname = (cj \ "name").extract[String]
      val cdims = (cj \ "dims").extract[List[String]].map(db.dimension)
      val cube = db.addCube(cname, cdims, spark.read.options(pqOpts).parquet(s"$dir/cubes/$cname"))
      (cj \ "rules").toOption.toList.flatMap(_.extract[List[JValue]])
        .foreach(rj => cube.registerRule(graft.olap.Rules.ruleFromJson(rj)))
      (cj \ "payloads").extractOpt[Map[String, String]].getOrElse(Map.empty)
        .foreach { case (ids, p) =>
          cube.restorePayload(ids.split(",").map(_.toInt).toVector, p) }
      (cj \ "views").toOption.filter(_ != JNothing)
        .foreach(v => cube.views.loadJson(JsonMethods.compact(JsonMethods.render(v))))
    }
    // reattach saved summaries over their persisted grain-sized frames —
    // no base scan; freshness anchors to the just-loaded base (the saved
    // base facts and summary facts are one consistent snapshot)
    (meta \ "summaries").toOption.toList
      .flatMap(_.extract[List[JValue]]).foreach { sj =>
        val sname = (sj \ "name").extract[String]
        val grain = (sj \ "grain").extract[List[JValue]].map {
          case JNull | JNothing => None
          case v => Some(v.extract[Int])
        }
        db.registerCube(graft.olap.Aggregates.loadFrame(
          db.cube((sj \ "base").extract[String]), sname, grain,
          spark.read.options(pqOpts).parquet(s"$dir/summaries/$sname")))
      }
    db
  }

  /** KEY ROTATION for a saved database (r14 verdict #2): re-encrypt the
    * store at `dir` from `oldEnc`'s password to `newEnc`'s, in place.
    * After it returns, the old password FAILS loudly and only the new one
    * serves.
    *
    * Cost model, stated honestly: parquet modular encryption under local
    * wrapping ([[GraftKmsClient]]) bakes the master key into every file's
    * key metadata as the wrapping key — there is NO KEK-only shortcut
    * that re-encrypts a small envelope and leaves 100 TB of data files
    * alone (that requires a double-wrapping external KMS, which this
    * deployment deliberately does not have). Rotation therefore REWRITES
    * the payloads: one distributed read-decrypt/write-encrypt pass, all
    * in-executor — the same shape as the save that created the store.
    * (The reference re-derives its Fernet key and re-encrypts every
    * payload on each save, `encryption.py:144-151` — rotation is implicit
    * there because every save already pays the full rewrite.)
    *
    * Staging: the new-key store lands in a sibling temp dir first, then
    * two atomic directory moves swap it in (`<dir>` →
    * `<dir>.rekey-old-<id>` → deleted; temp → `<dir>`). A crash between
    * the moves leaves `<dir>` absent with BOTH siblings intact — recover
    * by renaming whichever vintage you want back; no state loses its key
    * material at any point.
    */
  def rekey(dir: String, spark: SparkSession, oldEnc: Crypto.Encryptor,
      newEnc: Crypto.Encryptor): Unit = {
    val db = load(dir, spark, oldEnc)
    val dirPath = Paths.get(dir).toAbsolutePath
    val parent = dirPath.getParent
    val id = java.util.UUID.randomUUID().toString.take(8)
    val staged = parent.resolve(s"${dirPath.getFileName}.rekey-$id")
    // the loaded db's frames scan lazily FROM dir — saving to the sibling
    // streams decrypt-old/encrypt-new through the executors; saving onto
    // dir itself would self-overwrite the files mid-scan
    db.save(staged.toString, newEnc)
    val retired = parent.resolve(s"${dirPath.getFileName}.rekey-old-$id")
    Files.move(dirPath, retired, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Files.move(staged, dirPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(retired.toFile)
  }
}
