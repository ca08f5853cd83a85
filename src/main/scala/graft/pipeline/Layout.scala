package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so parquet
  * min/max footer stats prune on EVERY interleaved dimension, not just the
  * leading sort key of a lexicographic layout.
  *
  * Why this matters at 100 TB: a corpus range-partitioned on one key
  * answers that key's predicates with file skipping but full-scans on all
  * others. Interleaving the key bits makes each range-partitioned file
  * cover a small hyper-rectangle of the key space, so `col_i BETWEEN …`
  * prunes files for EVERY participating column — the layout trick behind
  * Delta/Iceberg `ZORDER BY`, built here from codegen'd builtins only
  * (`shiftright`/`bitwiseAND`/`shiftleft`/`bitwiseOR` unrolled at plan
  * build — no UDF, no custom expression needed).
  *
  * ≙ reference has no storage-layout control (its facts live in an
  * in-memory dict); this extends the training-data suite (SURVEY §2.16)
  * on the bucketed/partitioned-backing axis (`sources/FactSources`).
  */
object Layout {

  /** Morton code: interleave the low `bits` bits of each (non-negative,
    * integral) column — bit `i` of column `j` lands at position
    * `i * cols.size + j`. Caller quantizes doubles/strings to integer
    * ranks first (floor, bucket id, dictionary rank). Total
    * `bits * cols.size` must fit a signed long. Values above `2^bits - 1`
    * are masked (high bits ignored) — size `bits` to the real domain.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits * dims must fit a signed long, got $bits * ${cols.size}")
    val d = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The same Morton code as ANSI SQL over the given column expressions —
    * kept next to [[zValue]] so engine and oracle interleave identically
    * by construction.
    */
  def zValueSql(cols: Seq[String], bits: Int = 16): String = {
    val d = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * d + j})"
    terms.mkString(" | ")
  }

  /** Z-order the frame for writing: range-partition on the Morton code
    * into `numFiles` output splits and sort within each, so every written
    * file covers a contiguous z-range = a small hyper-rectangle in the
    * original key space. One shuffle (the range exchange samples bounds
    * itself); append `.write` downstream. The `__z` column is retained so
    * writers can also PARTITION BY a z prefix if directory-level pruning
    * is wanted on top of footer stats.
    */
  def zorderLayout(df: DataFrame, cols: Seq[Column], bits: Int = 16,
      numFiles: Int = 0): DataFrame = {
    val withZ = df.withColumn("__z", zValue(cols, bits))
    val parted =
      if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z"))
  }

  // ---------------------------------------------------------------------
  // Incremental Z-order maintenance: a manifest-driven file store where an
  // append re-clusters ONLY the files whose z-range overlaps the new keys
  // (the ivfAppend discipline applied to layout). The manifest — one
  // (path, zmin, zmax, rows) line per live data file — is the source of
  // truth for readers, so the append commits atomically at the manifest
  // rename and untouched files are never rewritten (byte-identical,
  // spec-pinned). This is the minimal form of the transaction-log layout
  // maintenance Delta/Iceberg `OPTIMIZE ZORDER` does.
  // ---------------------------------------------------------------------

  /** One live file of a z-ordered store. */
  final case class ZFile(path: String, zMin: Long, zMax: Long, rows: Long)

  /** Append outcome: which files were re-clustered vs left alone. The
    * re-clustered files are DEAD in the manifest but stay on disk until
    * [[zorderVacuum]] — readers whose plan pinned the pre-append file list
    * (a cube base frame, an in-flight job) must not hit
    * FileNotFoundException mid-append.
    */
  final case class ZAppendStats(rewrittenFiles: Seq[String],
      untouchedFiles: Seq[String], newFiles: Seq[String], batchRows: Long)

  /** A commit raced another writer: the manifest generation moved between
    * this append's read and its rename. The loser's segment files are
    * orphans ([[zorderVacuum]] collects them); no LIVE file was touched.
    */
  final class StaleManifestException(msg: String)
    extends IllegalStateException(msg)

  import org.apache.spark.sql.SparkSession

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_zmanifest.json")

  /** Load the live-file manifest. */
  def zorderManifest(spark: SparkSession, dir: String): Seq[ZFile] =
    readManifest(spark, dir)._2

  /** The store's commit generation: bumped by every successful
    * [[zorderWrite]]/[[zorderAppend]] manifest rename. Pre-versioning
    * stores (no `#zgen` header) read as generation 0.
    */
  def zorderGeneration(spark: SparkSession, dir: String): Long =
    readManifest(spark, dir)._1

  private def readManifest(spark: SparkSession, dir: String): (Long, Seq[ZFile]) = {
    val f = fs(spark, dir)
    val mp = manifestPath(dir)
    if (!f.exists(mp)) (0L, Seq.empty)
    else {
      val in = f.open(mp)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val lines = text.split('\n').filter(_.nonEmpty).toSeq
      val gen = lines.headOption.filter(_.startsWith("#zgen\t"))
        .map(_.stripPrefix("#zgen\t").toLong).getOrElse(0L)
      val files = lines.filterNot(_.startsWith("#")).map { line =>
        // fixed 4-field tab layout — no JSON parser dependency needed
        val p = line.split('\t')
        ZFile(p(0), p(1).toLong, p(2).toLong, p(3).toLong)
      }
      (gen, files)
    }
  }

  /** Atomically replace the manifest (temp write + rename), REFUSING a
    * lost update: the commit re-reads the live generation and throws
    * [[StaleManifestException]] when another writer committed since this
    * one read `expectedGen` — the silent last-rename-wins orphaning is now
    * a loud failure. (The re-check-then-rename window is not a lock; the
    * contract stays SINGLE-WRITER — this turns a violated contract into an
    * error instead of data loss.)
    */
  private def writeManifest(spark: SparkSession, dir: String,
      files: Seq[ZFile], expectedGen: Long): Unit = {
    val f = fs(spark, dir)
    val liveGen = readManifest(spark, dir)._1
    if (liveGen != expectedGen)
      throw new StaleManifestException(
        s"z-store $dir moved to generation $liveGen while this writer held " +
          s"$expectedGen — a concurrent append committed; this commit is " +
          "refused (its segment files are orphans for zorderVacuum)")
    val tmp = new org.apache.hadoop.fs.Path(dir, s"_zmanifest.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(((s"#zgen\t${expectedGen + 1}") +:
      files.map(zf => s"${zf.path}\t${zf.zMin}\t${zf.zMax}\t${zf.rows}"))
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    f.delete(manifestPath(dir), false)
    require(f.rename(tmp, manifestPath(dir)), s"manifest rename failed in $dir")
  }

  /** Delete data files under `dir` the manifest no longer references —
    * dead files from past appends and orphaned segments of refused
    * commits. EXPLICIT GC, never run by [[zorderAppend]] itself: a reader
    * whose plan captured the pre-append file list (a pinned cube base, an
    * in-flight job) reads dead files until its owner swaps — run vacuum
    * only when no reader can hold a file list older than the current
    * manifest (`graft.core.Cube.appendZorderedStore` vacuums with a
    * one-append grace for exactly this reason). `keep` exempts paths from
    * this sweep.
    */
  def zorderVacuum(spark: SparkSession, dir: String,
      keep: Set[String] = Set.empty): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val f = fs(spark, dir)
    def local(p: String): String = new Path(new java.net.URI(p).getPath).toString
    val live = zorderManifest(spark, dir).map(zf => local(zf.path)).toSet ++
      keep.map(local)
    val it = f.listFiles(new Path(dir), true)
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath
      val stale = st.isFile &&
        ((p.getName.endsWith(".parquet") && !live.contains(local(p.toString))) ||
          // a crashed commit's temp manifest (the rename never happened)
          p.getName.startsWith("_zmanifest.tmp-"))
      if (stale && f.delete(p, false)) deleted += p.toString
    }
    deleted.toSeq
  }

  /** Write a z-layouted frame as a new segment directory and return its
    * per-file z stats (one grouped pass over the `__z` column only).
    */
  private def writeSegment(spark: SparkSession, dir: String, seg: String,
      layouted: DataFrame, pqOptions: Map[String, String]): Seq[ZFile] = {
    val segDir = s"$dir/$seg"
    layouted.write.options(pqOptions).mode("overwrite").parquet(segDir)
    spark.read.options(pqOptions).parquet(segDir)
      .groupBy(input_file_name().as("path"))
      .agg(min(col("__z")).as("zmin"), max(col("__z")).as("zmax"),
        count(lit(1)).as("rows"))
      .collect()
      .map(r => ZFile(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.zMin)
  }

  /** Initial build of an incremental z-ordered store: layout `df` on the
    * Morton code of `cols`, write to a FRESH segment directory, record
    * the manifest. On an existing store this is a full re-layout that
    * commits at the next generation: the new segment's name is unique, so
    * a commit refused by a racing writer (StaleManifestException) leaves
    * only orphan files for [[zorderVacuum]] — live files are NEVER
    * overwritten (a fixed segment name would destroy data the surviving
    * manifest still references, before the generation check could run).
    * The stored files RETAIN the `__z` column (reads prune on it; appends
    * re-cluster by it without recomputing).
    */
  def zorderWrite(spark: SparkSession, dir: String, df: DataFrame,
      cols: Seq[Column], bits: Int = 16, numFiles: Int = 8,
      pqOptions: Map[String, String] = Map.empty): Seq[ZFile] = {
    val gen0 = zorderGeneration(spark, dir)
    val files = writeSegment(spark, dir,
      s"seg-${java.util.UUID.randomUUID().toString.take(8)}",
      zorderLayout(df, cols, bits, numFiles), pqOptions)
    writeManifest(spark, dir, files, gen0)
    files
  }

  /** Read the store through its manifest — only live files, so a reader
    * never sees a half-committed append (the manifest rename is the
    * commit point). Plans as a plain parquet scan: footer min/max stats
    * on `__z` and the original columns drive row-group pruning as usual.
    */
  def zorderRead(spark: SparkSession, dir: String,
      pqOptions: Map[String, String] = Map.empty): DataFrame = {
    val files = zorderManifest(spark, dir)
    require(files.nonEmpty, s"no z-ordered store at $dir")
    spark.read.options(pqOptions).parquet(files.map(_.path): _*)
  }

  /** INCREMENTAL append: re-cluster only the files whose `[zMin, zMax]`
    * contains at least one of the batch's z values — those files plus the
    * batch re-layout into a fresh segment; every other file is left
    * byte-untouched and keeps its manifest entry. A batch entirely outside
    * all live ranges rewrites nothing and lands as its own segment. The
    * overlap test joins the batch's DISTINCT z values against the (small,
    * broadcast) manifest intervals — never a driver scan of the batch.
    *
    * Shape at 100 TB: append cost is proportional to the data that
    * actually interleaves with the new keys (a time-correlated batch
    * touches the tail files only), not to the table — the same
    * touched-partitions-only argument as `Similarity.ivfAppend`.
    *
    * SINGLE-WRITER: serialize appends (the intake-pipeline shape;
    * `Cube.appendZorderedStore` additionally refuses concurrent bulk
    * writers loudly). A violated contract is DETECTED, not silent: the
    * manifest carries a commit generation, and a commit whose read
    * generation was superseded throws [[StaleManifestException]] instead
    * of last-rename-wins orphaning the other writer's rewrite — no live
    * file is lost, the loser's segment is garbage for [[zorderVacuum]].
    *
    * Replaced (hot) files stay ON DISK after the commit — readers that
    * pinned the previous file list keep working; reclaim them with
    * [[zorderVacuum]] once no such reader can exist.
    *
    * `replaceOn` (optional): treat the batch as LAST-WRITE-WINS on those
    * key columns — stored rows matching a batch key are dropped during
    * the rewrite. Sound ONLY when the keys determine the z columns
    * (equal key ⇒ equal z ⇒ the old row's file is in the overlap set);
    * a key set that doesn't pin the z value can leave stale rows in
    * cold files. The cube backing passes its full dimension key, which
    * contains the interleaved dims by construction.
    */
  /** Test seam: runs after the append's rewrite lands and before its
    * manifest commit — the window a racing writer's commit occupies.
    */
  private[graft] var appendCommitSeam: () => Unit = () => ()

  def zorderAppend(spark: SparkSession, dir: String, batch: DataFrame,
      cols: Seq[Column], bits: Int = 16, numFiles: Int = 4,
      replaceOn: Seq[String] = Nil,
      pqOptions: Map[String, String] = Map.empty): ZAppendStats = {
    val (gen0, manifest) = readManifest(spark, dir)
    require(manifest.nonEmpty, s"no z-ordered store at $dir — zorderWrite first")
    // ONE evaluation of the batch source for the whole append: the
    // touched-file probe, the rewrite and the row count all read this
    // cached frame (a streaming micro-batch would otherwise re-read its
    // source three times per trigger — the r13 verdict's 3× finding)
    val batchZ = batch.withColumn("__z", zValue(cols, bits))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batchRows = batchZ.count() // materializes the cache
      import spark.implicits._
      val intervals = manifest.map(zf => (zf.path, zf.zMin, zf.zMax))
        .toDF("path", "zmin", "zmax")
      val touched = batchZ.select(col("__z")).distinct()
        .join(broadcast(intervals),
          col("__z") >= col("zmin") && col("__z") <= col("zmax"))
        .select(col("path")).distinct()
        .collect().map(_.getString(0)).toSet
      val (hot, cold) = manifest.partition(zf => touched.contains(zf.path))
      val seg = s"seg-${java.util.UUID.randomUUID().toString.take(8)}"
      val rewriteInput =
        if (hot.isEmpty) batchZ
        else {
          val hotData = spark.read.options(pqOptions).parquet(hot.map(_.path): _*)
          val kept =
            if (replaceOn.isEmpty) hotData
            else hotData.join(
              batchZ.select(replaceOn.map(col): _*).distinct(),
              replaceOn, "left_anti")
          kept.unionByName(batchZ)
        }
      // already carries __z — re-layout without recomputing the interleave
      val layouted = rewriteInput.repartitionByRange(
        math.max(1, numFiles + hot.size), col("__z"))
        .sortWithinPartitions(col("__z"))
      val newFiles = writeSegment(spark, dir, seg, layouted, pqOptions)
      appendCommitSeam()
      // commits at gen0+1 or throws StaleManifestException — a racing
      // writer's committed work is never overwritten. Hot files stay on
      // disk (dead in the manifest) until zorderVacuum.
      writeManifest(spark, dir, cold ++ newFiles, gen0)
      ZAppendStats(hot.map(_.path), cold.map(_.path), newFiles.map(_.path),
        batchRows)
    } finally batchZ.unpersist(blocking = false)
  }
}
