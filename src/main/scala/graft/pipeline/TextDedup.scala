package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * All operators are pure DataFrame plans: the exact paths (hash / inverted
  * index) shuffle on content keys; the probabilistic paths (MinHash-LSH,
  * SimHash) shuffle on bucket keys so candidate generation never goes
  * quadratic — the 100 TB-safe shapes.
  */
object TextDedup {

  /** Hot-bucket exclusion accounting for the LSH candidate stages (one per
    * operator run; `hotBuckets == 0` means the run was clean). `examples`
    * carries up to 8 of the largest excluded (band, bucketHash, size)
    * triples so a capped run names WHICH buckets were dropped, not just how
    * many — the no-silent-caps rule.
    */
  final case class LshSkewReport(hotBuckets: Long, excludedRows: Long,
      maxBucket: Int, examples: Seq[(Int, Long, Long)])

  /** Last [[LshSkewReport]] of [[minhashLshPairs]] /[[simhashPairs]] in this
    * JVM (diagnostic surface; the warning also lands on stderr).
    */
  @volatile var lastLshSkew: Option[LshSkewReport] = None

  /** Sizing-pass result of the LSH candidate stage (one job, aggregate
    * grain): `bandedRows` = Σ bucket sizes (= docs × bands), `candVolume` =
    * Σ m·(m−1)/2 over SURVIVING buckets — the exact number of rows the
    * bucket self-join will emit (before the i<j halving is already applied
    * here). Drives the pair-dedup strategy choice below.
    */
  private final case class BandedStats(hotBuckets: Long, excludedRows: Long,
      bandedRows: Long, candVolume: Long)

  /** Last [[BandedStats]]-derived dedup-strategy choice (diagnostic; the
    * spec pins both paths' outputs equal).
    */
  @volatile private[graft] var lastPairDedupStrategy: String = ""

  /** High-dup regime bound: take the exactly-once chain-filter path when the
    * self-join will emit more than this many rows PER banded row (i.e. the
    * pair-dedup exchange, not the corpus, dominates). 4× ≈ where the extra
    * doc-array attach join breaks even against the saved 1×-volume shuffle +
    * hash-agg (measured at sf0.1: volume/rows = 587, chain 0.9 s vs
    * groupBy-dedup 8.8–65 s; at the 1e8 bench corpus volume/rows ≈ 0.01 and
    * the groupBy path's 4M-row exchange is noise).
    */
  private val ChainVolumeFactor = 4L

  /** The chain path attaches a per-doc band-hash array via a broadcast
    * join, so it additionally requires the doc count to be broadcastable:
    * 8M docs × (8 B id + ~40 B array) ≈ 400 MB hashed relation per
    * executor — the same order as the candidate-id broadcast bound below.
    * A corpus both huge AND high-dup is hot-bucket territory (capped →
    * groupBy path) anyway.
    */
  private val ChainDocsMax = 8000000L

  /** Small-corpus bound for the verify side (round 18, measured at sf0.1):
    * at or below this many documents — AND at most [[VerifySmallBytesMax]]
    * of optimizer-estimated input — the WHOLE corpus' shingle arrays ride
    * the two verify broadcasts directly, and the candidate-proportional
    * apparatus (persist cand + count it, distinct candidate ids, semi-join
    * the corpus) is skipped outright. That apparatus exists to avoid
    * corpus-sized work when the corpus is huge; at ≤64k docs it IS the
    * work: ~5 fixed jobs + 2 persists to bound a side that one scan
    * rebuilds in milliseconds. Sizing: 64k docs × ~2 KB sorted shingle
    * arrays ≈ 128 MB data ≈ ~300 MB hashed relation — the same
    * per-executor ceiling as the candidate-id gate above. Above either
    * bound the r17 candidate-proportional path runs unchanged (the 1e8
    * rows never qualify: nDocs alone excludes them).
    */
  private def VerifyAllDocsMax: Long =
    // system-property override exists so the spec suite can force the
    // LARGE (candidate-proportional) path on its small fixtures — without
    // it the path would only ever execute at bench scale. The suite runs
    // single-JVM-sequential (Test/fork with forked-parallel off), so the
    // property flip in Round18FixesSpec cannot race another suite's run.
    sys.props.get("graft.lsh.smallDocsMax").map(_.toLong).getOrElse(65536L)
  // 64 MB of OPTIMIZER-estimated input (for parquet: compressed file
  // bytes). Halved from r18's 128 MB (round-18 advice): highly
  // compressible text can decompress 3-4x, and TWO broadcast relations
  // (the i- and j-side attach frames don't share an exchange) are live at
  // once — 64 MB compressed keeps the pair of hashed relations within the
  // same ~300 MB-per-executor ceiling the candidate-id gate uses.
  private val VerifySmallBytesMax = BigInt(64L << 20)

  /** Serializes [[cappedBandedBuckets]]' sort-agg-scoped sizing collects
    * across threads (JVM-wide: the flip is per-session conf, but one lock
    * for all sessions is harmless — the guarded region is a short
    * aggregate-grain collect).
    */
  private object SortAggLock

  /** Hot-bucket KEYS are collected to the driver (and re-broadcast as a
    * local relation) up to this many buckets — pigeonhole-bounded at
    * bandedRows/maxBucket (≈40k at the 1e8 bench corpus, ~25 B each), so
    * the cap only guards pathological maxBucket choices. Above it the
    * anti-join keeps the frame shape.
    */
  private val HotCollectMax = 1000000L

  /** Storage level of the co-partitioned banded cache: DISK_ONLY. This
    * frame is bands× the corpus row count — the one intermediate guaranteed
    * BIGGER than the input — and cached in memory it occupies the unified
    * region the self-join needs to execute. Round 17 shipped a code/record
    * contradiction here (comment said DISK_ONLY-measured-OOM, code said
    * MEMORY_AND_DISK); round-18 A/B at 1e8 docs × 4 bands (the
    * huge8_pipe_minhash_pairs shape, 8 GB heap, back-to-back runs in
    * comparable host windows) settles it: DISK_ONLY 222.6 s vs
    * MEMORY_AND_DISK 341.3 s, spill 74 GB vs 90 GB, REAL (MXBean) GC
    * 10.3 s vs 18.8 s, and peak execution memory 53.5 GB vs 35.0 GB —
    * i.e. with the cache off-heap the join actually gets its execution
    * memory. On disk the sorted frame streams back at sequential-read
    * speed; sf0.1-scale corpora don't care (80k-row cache).
    * `SPARK_GRAFT_LSH_CACHE_LEVEL` overrides for experiments.
    */
  private lazy val lshCacheLevel: org.apache.spark.storage.StorageLevel =
    org.apache.spark.storage.StorageLevel.fromString(
      sys.env.getOrElse("SPARK_GRAFT_LSH_CACHE_LEVEL", "DISK_ONLY"))

  /** The capped, co-partitioned banded frame LSH candidate generation runs
    * on (round 17). ONE exchange: `banded` is hash-repartitioned by its
    * bucket key and persisted, after which every downstream stage is
    * exchange-free codegen — the bucket-size aggregation (partial+final
    * collapse on co-partitioned input), the hot-bucket broadcast anti-join
    * (broadcast joins preserve partitioning), and the caller's bucket
    * self-join (both sides carry the same hash partitioning as the join
    * key). The r16 shape paid THREE exchanges of the banded set here (a
    * sizing pass + both self-join sides).
    *
    * Two rejected alternatives, measured at 1e8 docs × 4 bands:
    * self-join with a separate sizing exchange (the r16 shape + cap) and a
    * bounded-collect TypedImperativeAggregate (one exchange, but 3.9e8
    * near-unique groups drive ObjectHashAggregate into its sort-based
    * fallback — 252 GB of sort spill and 33 GB of serialized-buffer
    * shuffle dwarfed the exchange it saved).
    *
    * Buckets with more than `maxBucket` members are EXCLUDED, loudly
    * ([[lastLshSkew]] + stderr: count, rows, largest bucket hashes) — a
    * bucket that hot means exact/near-exact duplicates, which is
    * [[exactDedup]]/[[wordSetFingerprint]] territory: the documented
    * contract is exact-dedup FIRST, then LSH for the near-dup tail. The
    * sizing pass rides the same cached frame, so the cap costs no
    * additional exchange.
    *
    * Returns (capped frame for the caller's self-join, the persisted
    * banded frame to release after materialization).
    */
  private def cappedBandedBuckets(banded0: DataFrame, keys: Seq[String],
      maxBucket: Int, opName: String): (DataFrame, DataFrame, BandedStats) = {
    // sortWithinPartitions: the cached frame carries the join ordering, so
    // the self-join sorts NEITHER side (two 4e8-row sorts at 1e8 docs,
    // paid once at cache build instead — and cheaper there, before the
    // cache occupies unified memory). The partition count is EXPLICIT:
    // a bare repartition(cols) is an AQE-coalescable shuffle, and a
    // coalesced read no longer reports the hash partitioning the
    // downstream self-join needs — the join then re-exchanges BOTH sides,
    // exactly the cost this frame exists to avoid (measured at 1e8: the
    // candidate stage's shuffle volume tripled).
    val spark = banded0.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val banded = banded0.repartition(nParts, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .persist(lshCacheLevel)
    val sizes = banded.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__m"))
    val hot = sizes.filter(col("__m") > maxBucket)
    // loud accounting AND self-join sizing in ONE cheap job over the cached
    // co-partitioned frame (this is also what materializes it): hot-bucket
    // count/rows, total banded rows, and the EXACT row count the bucket
    // self-join will emit (Σ m·(m−1)/2 over surviving buckets) — the
    // pair-dedup strategy below is chosen from measurements, not left to
    // AQE discovery-after-shuffle. Examples collect only when hot exist.
    val m = col("__m")
    val isHot = m > maxBucket
    // The bucket-size groupBy has ~one group PER CACHED ROW on low-dup
    // corpora (4e8 near-unique keys at the 1e8 bench corpus) — a hash
    // aggregate hash-inserts every row for near-zero combining and
    // spilled 63 GB there (measured, round 18). The cache is SORTED by
    // exactly these keys, so Spark's ReplaceHashWithSortAgg rule (off by
    // default) turns it into a zero-memory streaming sort-aggregate; the
    // rule only ever fires when the child ordering already satisfies the
    // grouping, so scoping it here cannot add a sort anywhere. Restored
    // in finally — session-global flips would reach unrelated plans.
    // The flip is SESSION-scoped while held (r18 advice): SortAggLock
    // serializes concurrent operator runs on one session so a second run
    // can never capture "true" as its restore value and leak the rule.
    // An UNRELATED query planned on the same session inside the window
    // still sees the rule — at worst it trades a hash aggregate for a
    // sort aggregate where its child ordering already satisfies the
    // grouping (performance-neutral to positive, never a semantics
    // change); callers needing full isolation should run these operators
    // on a cloned session (spark.newSession()).
    val sortAggKey = "spark.sql.execution.replaceHashWithSortAgg"
    def withSortAgg[T](body: => T): T = SortAggLock.synchronized {
      val prev = try spark.conf.get(sortAggKey) catch { case _: Throwable => "false" }
      spark.conf.set(sortAggKey, "true")
      try body finally spark.conf.set(sortAggKey, prev)
    }
    val stats = withSortAgg { sizes.agg(
      coalesce(sum(when(isHot, 1L)), lit(0L)).as("nb"),
      coalesce(sum(when(isHot, m)), lit(0L)).as("nr"),
      coalesce(sum(m), lit(0L)).as("rows"),
      coalesce(sum(when(!isHot, shiftright(m * (m - 1), 1))), lit(0L)).as("vol")).collect()(0) }
    val (nHot, nRows) = (stats.getLong(0), stats.getLong(1))
    val bs = BandedStats(nHot, nRows, stats.getLong(2), stats.getLong(3))
    val capped =
      if (nHot == 0) {
        lastLshSkew = Some(LshSkewReport(0L, 0L, maxBucket, Nil))
        banded
      } else if (nHot <= HotCollectMax) {
        // The hot set is pigeonhole-small (≤ bandedRows/maxBucket buckets ≈
        // 40k at the 1e8 corpus — an aggregate-grain collect, ~25 B/key).
        // Collecting it ONCE inside the sort-agg scope replaces two more
        // full passes of the bucket-size aggregation that capped runs used
        // to pay as HASH aggregates (the examples top-8 job, and the
        // anti-join's lazy broadcast build at first downstream action —
        // the latter ran outside any scope, i.e. the 63 GB-spill shape).
        // The local relation broadcast rebuilds nothing at action time.
        val hotAll = withSortAgg {
          hot.select(col(keys(0)).cast("int"), col(keys(1)).cast("long"), col("__m"))
            .collect()
        }
        val examples = hotAll.sortBy(r => -r.getLong(2)).take(8).toSeq
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        lastLshSkew = Some(LshSkewReport(nHot, nRows, maxBucket, examples))
        System.err.println(f"[graft.TextDedup] $opName: $nHot band-bucket(s) " +
          f"exceed maxBucket=$maxBucket ($nRows banded rows) — EXCLUDED from " +
          "candidate generation. Buckets this hot are exact/near-exact " +
          "duplicates: run exactDedup/fingerprint dedup first, or lower the " +
          "band width. Largest (band, bucketHash, size): " +
          examples.map { case (b, h, m) => s"($b, $h, $m)" }.mkString(", "))
        val hotKeySchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(keys(0),
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField(keys(1),
            org.apache.spark.sql.types.LongType)))
        val hotLocal = spark.createDataFrame(
          java.util.Arrays.asList(hotAll.map(r => Row(r.getInt(0), r.getLong(1))): _*),
          hotKeySchema)
        // key types: band/chunk columns are (int, long) in both operators —
        // cast the banded side defensively so the join never falls back to
        // a cross-type sort-merge
        banded.join(broadcast(hotLocal),
          banded(keys(0)).cast("int") === hotLocal(keys(0)) &&
            banded(keys(1)).cast("long") === hotLocal(keys(1)), "left_anti")
      } else {
        // pathological hot-set size (driver-collect unsafe): keep the
        // frame-shaped anti-join; examples job scoped to the sort agg
        val examples = withSortAgg { hot.orderBy(desc("__m"))
          .select(col(keys(0)).cast("int"), col(keys(1)).cast("long"), col("__m"))
          .limit(8).collect().toSeq
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))) }
        lastLshSkew = Some(LshSkewReport(nHot, nRows, maxBucket, examples))
        System.err.println(f"[graft.TextDedup] $opName: $nHot band-bucket(s) " +
          f"exceed maxBucket=$maxBucket ($nRows banded rows) — EXCLUDED " +
          "(hot set too large to collect; frame anti-join). Largest (band, " +
          "bucketHash, size): " +
          examples.map { case (b, h, m) => s"($b, $h, $m)" }.mkString(", "))
        banded.join(broadcast(hot.select(keys.map(col): _*)), keys, "left_anti")
      }
    (capped, banded, bs)
  }

  /** Distinct-word relation (id, w) — the inverted-index building block. */
  def wordRel(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("w")).distinct()

  /** Exact dedup: keep the smallest id per identical content key. */
  def exactDedup(df: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    df.withColumn("__k", keyExpr)
      .groupBy(col("__k")).agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .drop("__k")

  /** Canonical content fingerprint: sorted distinct words — catches
    * reordered/repeated-word duplicates that raw-text equality misses.
    */
  def wordSetFingerprint(textCol: Column): Column =
    array_join(array_sort(array_distinct(split(textCol, " "))), " ")

  /** Exact dedup with a SOURCE-PRIORITY keep rule: among rows sharing a
    * content key, keep the one with the smallest `priorityCol` (ties → the
    * smallest id) — "prefer the curated mirror over the crawl" instead of
    * [[exactDedup]]'s arbitrary min-id. The survivors ARE the per-key minima
    * of `struct(priority, id)` (struct comparison is lexicographic and id is
    * unique, so trailing carried fields never influence the choice): ONE
    * aggregation, no join back against the corpus — the same
    * aggregation-only shape that made segment dedup 4× faster than its
    * semi-join draft. Carried columns ride inside the struct.
    *
    * Output: (idCol, priority, carryCols…, n_dups).
    */
  def dedupExactPriority(df: DataFrame, idCol: String, keyExpr: Column,
      priorityCol: Column, carryCols: Seq[String] = Nil): DataFrame = {
    require(!carryCols.contains(idCol) && !carryCols.contains("priority"),
      "carryCols must not repeat the id or priority outputs")
    val packed = struct(
      (priorityCol.as("priority") +: col(idCol).as(idCol) +:
        carryCols.map(col)): _*)
    df.groupBy(keyExpr.as("__k"))
      .agg(min(packed).as("__keep"), count(lit(1)).as("n_dups"))
      .select((col(s"__keep.$idCol").as(idCol) +:
        col("__keep.priority").as("priority") +:
        carryCols.map(c => col(s"__keep.$c").as(c))) :+ col("n_dups"): _*)
  }

  /** Candidate pairs under EXACT prefix filtering (ppjoin-style): order each
    * doc's tokens by global document frequency (rarest first, token text as
    * tiebreak), index only the first `|d| − ⌈t·|d|⌉ + 1` tokens, and join
    * docs through those prefix tokens only. Any pair with Jaccard ≥ t shares
    * ≥1 prefix token (prefix-filtering principle), so the candidate set is a
    * SUPERSET of the answer — while a hot token ("the") has near-maximal
    * document frequency, lands at the end of every doc's order, and never
    * enters a prefix: posting lists stay bounded at 100 TB instead of going
    * quadratic in the hot token's corpus frequency.
    */
  private[graft] def jaccardCandidates(words: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docFreq = words.groupBy(col("w")).agg(count(lit(1)).as("__df"))
    val ranked = words.join(docFreq, Seq("w"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("__df").asc, col("w").asc)))
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col(idCol))))
    // ε guards FP noise in t·sz (0.9×30 = 27.000…004): erring low only
    // lengthens the prefix — a superset, never a miss
    val prefix = ranked.filter(
      col("__rn") <= col("__sz") - ceil(col("__sz") * threshold - 1e-9) + 1)
      .select(col(idCol), col("w"))
    prefix.select(col(idCol).as("i"), col("w"))
      .join(prefix.select(col(idCol).as("j"), col("w")), Seq("w"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("__np")).drop("__np")
  }

  /** EXACT word-set Jaccard near-dup pairs: prefix-filtered candidate
    * generation (never quadratic in hot-token frequency), then exact
    * verification — shared counts through the token relation restricted to
    * candidates, Jaccard = |∩| / (|A|+|B|−|∩|). Result-identical to the
    * naive inverted-index join.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    val t = wordRel(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = t.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val cand = jaccardCandidates(t, idCol, threshold)
    val shared = cand
      .join(t.select(col(idCol).as("i"), col("w")), Seq("i"))
      .join(t.select(col(idCol).as("j"), col("w")), Seq("j", "w"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("shared"))
    val result = shared
      .join(sizes.select(col(idCol).as("i"), col("sz").as("szi")), Seq("i"))
      .join(sizes.select(col(idCol).as("j"), col("sz").as("szj")), Seq("j"))
      .filter(least(col("szi"), col("szj")).cast("double") / greatest(col("szi"), col("szj"))
        >= threshold) // size-ratio prune: cheap upper bound on Jaccard
      .withColumn("sim", col("shared").cast("double") /
        (col("szi") + col("szj") - col("shared")).cast("double"))
      .filter(col("sim") >= threshold)
      .select(col("i"), col("j"), col("sim"))
    Lifecycle.materializeAndRelease(result, t)
  }

  /** One row per (doc, shingle): `shingle = 1` is the word relation;
    * `shingle = n` emits n-word shingles (w_i … w_{i+n-1} joined by a
    * non-text separator), which make MinHash order-sensitive — reordered
    * documents stop colliding, the classic shingling upgrade. The shingle
    * array is built with `transform`+`slice` over the split (scan-shaped,
    * no join); hashing happens downstream so the shingle text never
    * shuffles.
    */
  private def shingleRel(df: DataFrame, idCol: String, textCol: String,
      shingle: Int): DataFrame =
    if (shingle <= 1)
      df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
    else {
      // split once behind a projection boundary: inlined, every slice()
      // in the lambda re-tokenizes the document (see TextAnalysis
      // .ngramCounts — measured 5.6× there)
      val words = col("__w")
      df.select(col(idCol), split(col(textCol), " ").as("__w"))
        .select(col(idCol), explode(transform(
          sequence(lit(1), greatest(size(words) - (shingle - 1), lit(1))),
          i => array_join(slice(words, i, lit(shingle)), ""))).as("w"))
    }

  /** MinHash signatures as ONE array column — a pure PROJECTION (round
    * 16): each document's k-slot signature is a function of its own row,
    * computed in place by the codegen'd
    * [[graft.functions.MinHashSignature]] expression over the per-row
    * shingle-hash array. Zero exchange: the former
    * `explode(shingles) → groupBy(doc)` + [[graft.functions.MinHashSketch]]
    * shape shuffled one k·8-byte sketch per document — 13.5 GB and the
    * dominant cost at 1e8 docs (measured, BENCH r16 bring-up) — for an
    * aggregation the one-row-per-document input never needed. Signatures
    * are bit-identical to the aggregate's (same splitmix64 family;
    * spec-pinned), documents with a NULL text drop exactly like their
    * empty groups did, and [[MinHashSketch]] remains the right shape for
    * inputs already at (group, hash) grain.
    *
    * Deliberately NOT k separate min-over-transform columns: one fused
    * expression keeps codegen O(1)-sized per plan (the O(k)-column shape
    * janino-recompiles inside every enclosing plan, measured 10×) and
    * walks the hash array once for all k slots.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int,
      shingle: Int = 1): DataFrame =
    signaturesAnd(df, idCol, textCol, k, shingle)

  /** [[minhashSignatures]] plus extra per-doc columns computed from the
    * SAME split-words array `col("__w")` in the same projection — the
    * small-corpus combined attach frame (round 19) derives the signature
    * band hashes AND the verify shingle array in one corpus scan instead
    * of two. Values are identical to the separate derivations by
    * construction (same expressions over the same input).
    */
  private def signaturesAnd(df: DataFrame, idCol: String, textCol: String,
      k: Int, shingle: Int, extra: (String, Column)*): DataFrame = {
    val words = col("__w")
    val hashes =
      if (shingle <= 1) transform(words, w => xxhash64(w))
      else transform(
        sequence(lit(1), greatest(size(words) - (shingle - 1), lit(1))),
        i => xxhash64(array_join(slice(words, i, lit(shingle)), "")))
    // split bound behind a projection boundary: CollapseProject keeps it
    // (multi-reference, non-cheap) for shingle > 1, and for shingle = 1 the
    // collapsed form still evaluates split once per row (it is the
    // transform's input, never inside the lambda)
    df.select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol) +: graft.functions.MinHashSignature(hashes, k).as("sig") +:
        extra.map { case (n, c) => c.as(n) }: _*)
      .where(col("sig").isNotNull)
  }

  /** Sorted distinct shingle-hash array per document (the exact-verify side
    * of [[minhashLshPairs]]); `shingle = 1` hashes words, `shingle = n`
    * hashes n-word shingles — long compares downstream, never strings.
    */
  private def shingleHashArr(textCol: Column, shingle: Int): Column =
    shingleHashFromWords(split(textCol, " "), shingle)

  /** Same array computed from an already-split words column. */
  private def shingleHashFromWords(words: Column, shingle: Int): Column = {
    if (shingle <= 1) array_sort(array_distinct(transform(words, w => xxhash64(w))))
    else array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(words) - (shingle - 1), lit(1))),
      i => xxhash64(array_join(slice(words, i, lit(shingle)), "")))))
  }

  /** MinHash-LSH near-dup pairs: band the k-wide signature into `bands`
    * groups of k/bands rows, hash each band, bucket-join candidates on
    * (band, bandHash), then EXACT-verify candidates with shingle-set
    * Jaccard. Candidate generation cost is bucket-local — never all-pairs —
    * AND bucket-size-bounded: buckets above `maxBucket` members are
    * excluded with loud accounting ([[lastLshSkew]] + stderr), because a
    * bucket of m near-identical docs emits m² candidate rows (a 1e5-doc
    * template bucket would be 1e10 shuffle rows) and a bucket that hot is
    * exact-dup territory — the contract is [[exactDedup]] first, LSH for
    * the near-dup tail. `shingle > 1` switches from word-set to
    * n-word-shingle similarity (order-sensitive: reordered documents stop
    * colliding).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.9,
      shingle: Int = 1, maxBucket: Int = 10000): DataFrame = {
    // ONE exchange (the co-partitioning repartition inside); the sizing
    // pass, the cap, and the bucket self-join below all run exchange-free
    // on the cached frame. The join emits a pair once per matching band;
    // the DEDUP strategy is chosen from the sizing pass's measured
    // self-join volume (round 18):
    //
    // - High-dup regime (volume ≫ banded rows, no hot buckets, broadcastable
    //   doc count): each side attaches its doc's full band-hash array via a
    //   partitioning-preserving broadcast join, and a codegen'd boolean
    //   chain (`band ≤ b || bi[b] ≠ bj[b]` over all prior bands, And
    //   short-circuit) keeps a pair only in its FIRST matching band —
    //   exactly-once emission, NO dedup exchange at all. Measured at sf0.1
    //   (5k docs, 47M joined rows → 9.36M distinct pairs): chain 0.9 s vs
    //   groupBy-dedup 8.8–65 s — the partial aggregate hash-inserted 44M
    //   near-unique keys for zero combining (copies of a pair live in
    //   different band partitions by construction). An interpreted
    //   zip_with/exists form of the same filter measured 36 s — higher-order
    //   lambdas don't codegen; the chain of GetArrayItem comparisons does.
    //
    // - Otherwise: lean groupBy on the bare (i, j) ids — 12-byte shuffle
    //   rows. At the 1e8 bench corpus volume/rows ≈ 0.01, the dedup
    //   exchange is ~4M rows (noise) and the chain path's array attach
    //   would cost a banded-frame exchange — measurement picks the lean
    //   shape there. With HOT buckets the chain path is WRONG, not just
    //   slow: a pair whose first matching band was cap-excluded must still
    //   surface via a later surviving band, so capped runs always dedup by
    //   groupBy (spec-pinned on the skewed fixture).
    //
    // Persisted: read by the verify joins AND the candidate-id semi-join
    // below.
    val stage = minhashCandidateStage(df, idCol, textCol, k, bands, shingle, maxBucket)
    val (banded, docBhs) = (stage.banded, stage.docBhs)
    if (stage.small) {
      // Small-corpus verify (round 18, [[VerifyAllDocsMax]]): the whole
      // corpus' shingle arrays ride the two verify broadcasts — candidates
      // flow through candidate generation, the chain filter and the verify
      // merge-walk in ONE fused pass (cand has a single consumer, so the
      // persist + count + distinct-id + semi-join jobs of the large path
      // buy nothing here; measured at sf0.1 they were ~40% of the row).
      // Round 19: on the chain path the attach frame ALSO carries the
      // band-hash array, so the deferred chain filter and the verify read
      // from the same two broadcasts (r18 built four).
      val joined =
        if (stage.chainDeferred) {
          val attach = signaturesAnd(df, idCol, textCol, k, shingle,
              "ws" -> shingleHashFromWords(col("__w"), shingle))
            .select(col(idCol), bandHashArrOf(bands, k / bands).as("__bhs"), col("ws"))
          stage.cand0
            .join(broadcast(attach.select(col(idCol).as("i"),
              col("__bhs").as("__bi"), col("ws").as("wi"))), Seq("i"))
            .join(broadcast(attach.select(col(idCol).as("j"),
              col("__bhs").as("__bj"), col("ws").as("wj"))), Seq("j"))
            .filter(chainFilter(bands))
        } else {
          val wordsAll = df.select(col(idCol), shingleHashArr(col(textCol), shingle).as("ws"))
          stage.cand0
            .join(broadcast(wordsAll.select(col(idCol).as("i"), col("ws").as("wi"))), Seq("i"))
            .join(broadcast(wordsAll.select(col(idCol).as("j"), col("ws").as("wj"))), Seq("j"))
        }
      val result = joined
        .withColumn("__inter", graft.functions.SortedIntersectCount(col("wi"), col("wj")))
        .withColumn("sim", col("__inter").cast("double") /
          (size(col("wi")) + size(col("wj")) - col("__inter")).cast("double"))
        .filter(col("sim") >= threshold)
        .select(col("i"), col("j"), col("sim"))
      return Lifecycle.materializeAndRelease(result, banded)
    }
    val cand = stage.cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact verification via word-hash arrays (long compares, not string
    // compares) — built for CANDIDATE ids only (round 17): the verify side
    // must be candidate-proportional, not corpus-proportional. The former
    // corpus-wide `words` frame shuffled every document's shingle array
    // into BOTH verify joins (~10 GB twice at 1e8 docs) to verify a pair
    // set that is orders smaller. The broadcast decision is made from the
    // MEASURED candidate count (cand is persisted; the count materializes
    // it once for all downstream consumers) instead of left to AQE — AQE
    // plans the semi-join sort-merge first and discovers the broadcastable
    // side only after the corpus shuffle has already materialized
    // (measured at 1e8: the full 8 GB doc exchange ran before the join
    // converted).
    val candN = cand.count()
    val candIds = cand.select(col("i").as(idCol))
      .union(cand.select(col("j").as(idCol))).distinct()
    // Broadcast gate on a MEASURED bound for the distinct-id count, not the
    // pair count (round 18, advice): distinct ids run up to 2× the pairs,
    // and a hashed relation costs ~40 B/key (8 B long key + UnsafeRow + map
    // overhead) — 8M ids ≈ 320 MB per executor, the honest ceiling for 8 GB
    // heaps. Two free exact bounds cover almost every run: ids ≤ 2×pairs
    // (cheap candN) and ids ≤ docs (the sizing pass already measured the
    // corpus row count — the sf0.1 high-dup case: 9.36M pairs among 5k
    // docs must not pay a distinct-count pass to learn ids ≈ 4k). Only a
    // huge corpus AND a huge candidate set (both bounds > 8M) pays one
    // distinct aggregate over the persisted cand frame. Above the bound the
    // shuffle semi-join is the honest shape — a corpus-sized candidate set
    // must not be broadcast.
    val candIdsN =
      if (candN * 2 <= ChainDocsMax || stage.nDocs <= ChainDocsMax)
        math.min(candN * 2, stage.nDocs)
      else candIds.count()
    val candIdsHinted =
      if (candIdsN <= ChainDocsMax) broadcast(candIds) else candIds
    val words = df.join(candIdsHinted, Seq(idCol), "left_semi")
      .select(col(idCol), shingleHashArr(col(textCol), shingle).as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val result = cand
      .join(words.select(col(idCol).as("i"), col("ws").as("wi")), Seq("i"))
      .join(words.select(col(idCol).as("j"), col("ws").as("wj")), Seq("j"))
      // codegen'd merge walk over the sorted arrays (array_intersect builds a
      // hash set per pair); |A∪B| = |A|+|B|−|A∩B| on sets — same exact sim
      .withColumn("__inter", graft.functions.SortedIntersectCount(col("wi"), col("wj")))
      .withColumn("sim", col("__inter").cast("double") /
        (size(col("wi")) + size(col("wj")) - col("__inter")).cast("double"))
      .filter(col("sim") >= threshold)
      .select(col("i"), col("j"), col("sim"))
    Lifecycle.materializeAndRelease(result,
      (Seq(banded, words, cand) ++ docBhs): _*)
  }

  /** The distinct candidate-pair stage of [[minhashLshPairs]], exposed
    * `private[graft]` so the plan-shape spec can pin its executed shape
    * (round-18 verdict ask: the one-exchange claim must be a test, not a
    * memory). `cand0` is the UNPERSISTED distinct (i, j) frame; `banded`
    * and `docBhs` are live caches the caller must release.
    */
  private[graft] final case class MinhashCandidates(cand0: DataFrame,
      capped: DataFrame, banded: DataFrame, docBhs: Option[DataFrame],
      strategy: String, nDocs: Long, small: Boolean,
      chainDeferred: Boolean = false)

  /** First-matching-band chain predicate over attached `__bi`/`__bj`
    * band-hash arrays and the joined row's `band` — keeps a pair only in
    * the first band where both hashes agree (exactly-once emission; a
    * codegen'd And-chain of GetArrayItem compares, see the chain-path
    * notes in [[minhashCandidateStage]]).
    */
  private def chainFilter(bands: Int): Column =
    (0 until bands - 1).map(b =>
      col("band") <= b || col("__bi").getItem(b) =!= col("__bj").getItem(b))
      .reduceOption(_ && _).getOrElse(lit(true))

  /** The per-signature band-hash array (64-bit buckets, round 18). */
  private def bandHashArrOf(bands: Int, rows: Int): Column =
    array((0 until bands).map(bi =>
      xxhash64(lit(bi), slice(col("sig"), bi * rows + 1, rows))): _*)

  private[graft] def minhashCandidateStage(df: DataFrame, idCol: String,
      textCol: String, k: Int, bands: Int, shingle: Int,
      maxBucket: Int): MinhashCandidates = {
    val rows = k / bands
    val sig = minhashSignatures(df, idCol, textCol, k, shingle)
    // 64-bit band-bucket hashes (round 18): with a 32-bit `hash()` the
    // birthday term bands·n²/2³³ manufactures candidates from BUCKET-HASH
    // collisions alone — measured at the 1e8 bench corpus: 4.66M of the
    // 5.66M candidates were collision noise (4·(1e8)²/2³³ ≈ 4.7M), which
    // pushed distinct candidate ids past the broadcast bound and forced a
    // corpus-wide shuffle semi-join in the verify (~37 s of the row).
    // xxhash64 pushes the birthday term to n ≈ 10¹⁰ (bands·n²/2⁶⁵ < 1).
    // Results are identical by construction: docs with EQUAL signature
    // slices collide under any hash, and unequal-slice collisions were
    // verify-rejected noise. Cost: +4 B/banded row in the cache.
    def bandHashArr: Column = bandHashArrOf(bands, rows)
    val banded0 = sig.select(col(idCol),
      posexplode(bandHashArr).as(Seq("band", "bh")))
    val (capped, banded, bstats) = cappedBandedBuckets(banded0, Seq("band", "bh"),
      maxBucket, "minhashLshPairs")
    val nDocs = bstats.bandedRows / math.max(bands, 1)
    // optimizer estimate of the input (actual file bytes for a parquet
    // scan); gates the small-corpus shortcuts together with nDocs
    val inputBytes = try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => BigInt(Long.MaxValue) }
    val small = nDocs <= VerifyAllDocsMax && inputBytes <= VerifySmallBytesMax
    val useChain = bstats.hotBuckets == 0 &&
      bstats.candVolume > ChainVolumeFactor * bstats.bandedRows &&
      nDocs <= ChainDocsMax
    lastPairDedupStrategy = if (useChain) "chain" else "groupby"
    if (useChain && bands == 1) {
      // a single band emits each pair exactly once by construction — no
      // prior-band filter, no array attach, no dedup of any kind
      val cand0 = capped.select(col(idCol).as("i"), col("band"), col("bh"))
        .join(capped.select(col(idCol).as("j"), col("band"), col("bh")), Seq("band", "bh"))
        .filter(col("i") < col("j"))
        .select(col("i"), col("j"))
      MinhashCandidates(cand0, capped, banded, None, "chain", nDocs, small)
    } else if (useChain && small) {
      // Small corpora (round 19): the chain filter is DEFERRED to the
      // verify — cand0 carries the joined row's `band` and the caller
      // attaches ONE combined broadcast frame per side holding both the
      // band-hash array (chain dedup) and the shingle array (verify).
      // r18 paid FOUR broadcast builds here (two docBhs + two wordsAll,
      // each re-scanning the ≤64 MB input); the combined attach pays two,
      // and the chain + verify still fuse into one codegen stage.
      val cand0 = capped.select(col(idCol).as("i"), col("band"), col("bh"))
        .join(capped.select(col(idCol).as("j"), col("band"), col("bh")), Seq("band", "bh"))
        .filter(col("i") < col("j"))
        .select(col("i"), col("j"), col("band"))
      MinhashCandidates(cand0, capped, banded, None, "chain", nDocs, small,
        chainDeferred = true)
    } else if (useChain) {
      // Per-doc band-hash array for the prior-band chain filter, rebuilt
      // FROM the cache (one exchange of bandedRows rows — cheap by the
      // volume ≫ rows precondition; no second corpus scan): array_sort on
      // struct(band, bh) orders by band, so bhs[b] is band b's hash.
      // Persisted because broadcast-exchange reuse does NOT fire across
      // the two self-join sides here (measured: the aggregate ran twice).
      val docBhs =
        capped.groupBy(col(idCol)).agg(
          transform(array_sort(collect_list(struct(col("band"), col("bh")))),
            x => x.getField("bh")).as("__bhs"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // arrays attach AFTER the self-join, not before: the sort-merge join
      // copies its buffered side (and its output rows) field-by-field, and
      // carrying a bands-wide array through 47M joined rows measured ~21 s
      // of pure copy CPU at sf0.1. Post-join the two broadcast hash joins
      // fuse with the chain filter in ONE codegen stage — the arrays are
      // read IN PLACE from the broadcast relations and never materialize
      // into any output row (the final projection is the bare ids).
      // (bands = 1 has no prior bands — handled above, never reaches here.)
      val cand0 = capped.select(col(idCol).as("i"), col("band"), col("bh"))
        .join(capped.select(col(idCol).as("j"), col("band"), col("bh")), Seq("band", "bh"))
        .filter(col("i") < col("j"))
        .join(broadcast(docBhs.select(col(idCol).as("i"), col("__bhs").as("__bi"))), Seq("i"))
        .join(broadcast(docBhs.select(col(idCol).as("j"), col("__bhs").as("__bj"))), Seq("j"))
        .filter(chainFilter(bands))
        .select(col("i"), col("j"))
      MinhashCandidates(cand0, capped, banded, Some(docBhs), "chain", nDocs, small)
    } else {
      val cand0 = capped.select(col(idCol).as("i"), col("band"), col("bh"))
        .join(capped.select(col(idCol).as("j"), col("band"), col("bh")), Seq("band", "bh"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("__nb")).drop("__nb")
      MinhashCandidates(cand0, capped, banded, None, "groupby", nDocs, small)
    }
  }

  /** 64-bit SimHash over DISTINCT word hashes (vote sums are multiset-
    * sensitive, so the distinct matters here): per bit, sum of ±1
    * contributions; bit set iff the sum is positive. A pure PROJECTION
    * (round 16, same move as [[minhashSignatures]]): the per-doc distinct
    * is `array_distinct` in place and the codegen'd
    * [[graft.functions.SimHashSignature]] folds the votes per row — the
    * former `wordRel → groupBy` shape paid TWO shuffles (a global
    * distinct of word STRINGS, then the doc-grain aggregate) for a value
    * that never needed to leave its row. Outputs are bit-identical
    * (spec-pinned); docs with a NULL text drop exactly like their absent
    * groups did. [[graft.functions.SimHashBits]] remains for inputs
    * already at (group, hash) grain.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), graft.functions.SimHashSignature(
        transform(array_distinct(split(col(textCol), " ")), w => xxhash64(w)))
        .as("simhash"))
      .where(col("simhash").isNotNull)

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (≤ 3): band
    * the 64-bit hash into 4×16-bit chunks; by pigeonhole any pair within
    * distance 3 shares ≥1 exact chunk — candidate generation is COMPLETE,
    * not probabilistic, and bucket-local. Final bit_count filter is exact.
    *
    * Same hot-bucket cap as [[minhashLshPairs]]: a chunk bucket above
    * `maxBucket` members (identical/near-identical docs share ALL chunks)
    * is excluded with loud accounting — completeness then holds for every
    * pair outside the reported buckets, and the buckets themselves are
    * exact-dup territory ([[exactDedup]] first).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole guarantees completeness only up to 3")
    val sh = simhash(df, idCol, textCol)
    val banded0 = sh.select(col(idCol), col("simhash"), posexplode(array(
      (0 until 4).map(b => shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*))
      .as(Seq("band", "chunk")))
    // same one-exchange co-partitioned candidate stage as minhashLshPairs
    val (capped, banded, bstats) = cappedBandedBuckets(banded0, Seq("band", "chunk"),
      maxBucket, "simhashPairs")
    val joined = capped
      .select(col(idCol).as("i"), col("simhash").as("hi"), col("band"), col("chunk"))
      .join(capped.select(col(idCol).as("j"), col("simhash").as("hj"), col("band"), col("chunk")),
        Seq("band", "chunk"))
      .filter(col("i") < col("j"))
    // Exactly-once emission via the FIRST-matching-chunk chain (round 18):
    // both 64-bit signatures are already on the joined row, so every prior
    // band's chunk derives in place by bit ops — no dedup exchange, and
    // unlike minhash no array attach either. With HOT buckets the chain is
    // wrong (a pair whose first matching chunk was cap-excluded must
    // surface via a later surviving one), so capped runs keep the distinct.
    def chunkOf(c: Column, b: Int): Column =
      shiftright(c, b * 16).bitwiseAND(0xFFFFL)
    val once =
      if (bstats.hotBuckets == 0)
        joined.filter((0 until 3).map(b =>
          col("band") <= b || chunkOf(col("hi"), b) =!= chunkOf(col("hj"), b))
          .reduce(_ && _))
          .select(col("i"), col("j"),
            bit_count(col("hi").bitwiseXOR(col("hj"))).as("hamming"))
      else joined
        .select(col("i"), col("j"),
          bit_count(col("hi").bitwiseXOR(col("hj"))).as("hamming"))
        .distinct()
    val result = once.filter(col("hamming") <= maxHamming)
    Lifecycle.materializeAndRelease(result, banded)
  }

  /** Connected components over a near-dup pair list: every doc's
    * `cluster_id` converges to the MIN doc id in its component via
    * min-label propagation — one shuffle join + agg per round, rounds =
    * graph diameter. Near-dup components are dense and shallow (a duplicate
    * set is close to a clique), so 2–3 rounds in practice; `maxIters`
    * bounds pathological chains and convergence is detected by the strictly
    * decreasing label sum (one scalar action per round, no extra join).
    *
    * This is the dedup-group step after any pairs operator (Jaccard,
    * MinHash, SimHash, embedding-LSH): keep `id === cluster_id` rows as the
    * canonical representative, anti-join the rest out of the corpus. Only
    * docs that appear in `pairs` are returned — absent docs are singleton
    * clusters of themselves by definition.
    *
    * The iterative driver loop coordinates plain DataFrame jobs (the
    * standard Spark shape for graph fixpoints). Every per-round label frame
    * is eagerly `localCheckpoint`ed: lineage MUST be cut at every
    * materialization — the pointer-jump self-join doubles the analyzed plan
    * per round, so deferring the cut (persist+count, lineage intact) blows
    * Catalyst analysis up exponentially (measured 3.8× slower end-to-end at
    * sf0.1 with a 6-round cut cadence). Checkpoint blocks are freed by the
    * ContextCleaner once the superseded frame is dropped; rounds are
    * bounded by `maxIters` and label frames are one row per paired doc, so
    * peak storage is a few times the label table — acceptable, and the
    * deterministic-unpersist alternative is the thing that was 3.8× slower.
    */
  def dedupClusters(pairs: DataFrame, iCol: String = "i", jCol: String = "j",
      maxIters: Int = 25, driverEdgeCap: Long = 5_000_000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col(iCol).cast("long").as("a"), col(jCol).cast("long").as("b"))
      .persist(lvl)
    // SIZE-ADAPTIVE strategy, same spirit as Spark's small-side→broadcast
    // join planning: the near-dup pair graph after banding is typically
    // ORDERS smaller than the corpus (here: thousands of paired docs out of
    // 1e5), and a graph fixpoint as driver-coordinated Spark jobs pays
    // ~10-15 tiny-job latencies regardless of data size (~4-5 s at any
    // small scale). Below `driverEdgeCap` edges (≈16 bytes each — the
    // default 5e6 caps driver heap at ~80 MB) the edge list is collected
    // and solved with in-memory union-find (min-id root, path compression):
    // exact same labels, one collect instead of a multi-round loop. The
    // distributed min-label fixpoint below remains the path for genuinely
    // huge pair sets — the 100 TB contract is unchanged, the cap only
    // routes the small case off the job scheduler. Set driverEdgeCap=0 to
    // force the distributed path (the property spec exercises both).
    val nEdges = edges.count()
    if (nEdges <= driverEdgeCap) {
      val spark = pairs.sparkSession
      val parent = new scala.collection.mutable.LongMap[Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // collect PRIMITIVES, not Rows: a GenericRow with two boxed longs is
      // ~100+ bytes — 5e6 of them is ~0.5 GB and would OOM a modest driver
      // heap right at the cap (r8 advice). Packing each partition into one
      // flat Array[Long] keeps the promised ~16 bytes/edge in one job.
      val packed: Array[Array[Long]] = edges.rdd.mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
        Iterator.single(buf.result())
      }.collect()
      packed.foreach { chunk =>
        var i = 0
        while (i < chunk.length) {
          val a = chunk(i); val b = chunk(i + 1); i += 2
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          // attach the LARGER root under the smaller: the surviving root of a
          // component is always its MIN id — the min-label fixpoint's answer
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
      }
      edges.unpersist(blocking = false)
      val out = parent.keys.toArray.sorted.map(id => Row(id, find(id)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq, math.max(1, out.length / 500000)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cluster_id", org.apache.spark.sql.types.LongType))))
    }
    // partitioned ONCE by the per-round join key: every edge round reuses
    // this partitioning, so only the (small) label table shuffles per round
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("b")).persist(lvl)
    var labels = sym.groupBy(col("a").as("id"))
      .agg(min(least(col("a"), col("b"))).as("label")).localCheckpoint(true)
    // coalesce: SUM over an empty frame is null — an empty pair list (zero
    // near-dups in the corpus) must yield an empty result, not an NPE
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid")).agg(min(col("label")).as("nbr"))
      // lazily persisted, NOT checkpointed: the jump self-join below reads
      // prop twice, and a bare reference would carry the edge-join subtree
      // twice into next's plan (the one-checkpoint-no-persist variant
      // measured SLOWER at sf0.1, 4.2 s → 5.3 s, round 7, for exactly that
      // reason). The cache materializes once inside next's checkpoint job —
      // one job per round instead of two — and lineage stays shallow
      // because `labels` was checkpointed at round start.
      val prop = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .persist(lvl)
      // ONE pointer jump per round: label(x) := min(label(x), label(label(x)))
      // — joins the LABEL table with itself (labels are always node ids, so
      // every label has a row), never the ×|E| edge frame. Hook+jump per
      // round collapses chains in O(log diameter) expensive edge rounds; an
      // inner jump-to-fixpoint loop is NOT worth it (each extra jump is a
      // full materialize + action, and near-dup components are shallow
      // cliques where the first jump is already a no-op).
      val next = prop.join(
        prop.select(col("id").as("__lid"), col("label").as("__ll")),
        col("label") === col("__lid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("__ll"), col("label"))).as("label"))
        .localCheckpoint(true)
      // NOTE: do NOT prune "same-label" edges here — an edge whose endpoints
      // currently agree can be the very bridge one endpoint's label came
      // through (equality ≠ redundancy); dropping it cuts that endpoint off
      // from future smaller labels. The union-find property spec catches
      // this class of bug on random graphs.
      //
      // Convergence: both steps only ever DECREASE labels elementwise, so an
      // unchanged total sum across the round means the edge step AND the
      // jump were both no-ops — a true fixpoint, where every sym edge has
      // equal-labelled endpoints (both directions present ⇒ ≤ both ways).
      val nextSum = labelSum(next)
      // release SUPERSEDED checkpoints deterministically: unpersist their
      // backing RDDs (DataFrame.unpersist cannot reach RDD-level checkpoint
      // blocks; the ContextCleaner only frees them at driver GC time) —
      // peak storage stays ~2 label frames regardless of round count
      prop.unpersist(blocking = false); release(labels)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      it += 1
    }
    sym.unpersist(); edges.unpersist(blocking = false)
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  private def release(df: DataFrame): Unit =
    org.apache.spark.sql.graft.Bridge.checkpointRdd(df)
      .foreach(_.unpersist(blocking = false))

  /** End-to-end near-dup purge — the corpus-in → cleaned-corpus-out
    * composition a training-data pipeline actually runs: near-dup pairs
    * (MinHash-LSH by default) → connected components → drop every doc that
    * is NOT its component's canonical representative (the MIN doc id).
    * Docs in no pair are singleton components and survive untouched — the
    * anti-join removes only `id =!= cluster_id` rows, so no join against
    * the full corpus is needed for the keep-side.
    *
    * Shape at 100 TB: pairs are banded (never all-pairs), components are
    * one bounded shuffle per diameter round, and the final purge is a
    * broadcast-friendly left-anti join against the (small) losers set.
    */
  def purgeNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.9): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, k, bands, threshold)
    val losers = dedupClusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[purgeNearDups]] with a QUALITY keep-rule: per near-dup cluster,
    * keep the member with the smallest `priorityExpr` (ties → smallest
    * id) instead of the arbitrary min-id canonical — "keep the longest /
    * highest-quality / curated-source copy", the keep-rule real curation
    * pipelines run ([[dedupExactPriority]]'s discipline lifted from exact
    * groups to near-dup CLUSTERS). Priorities are evaluated only for
    * clustered docs (the cluster frame ≪ corpus); the keeper per cluster
    * is one `min(struct(priority, id))` aggregation, and the purge is the
    * same broadcast-friendly anti-join — nothing touches singleton docs.
    */
  def purgeNearDupsPriority(df: DataFrame, idCol: String, textCol: String,
      priorityExpr: Column, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.9): DataFrame = {
    val clusters = dedupClusters(
      minhashLshPairs(df, idCol, textCol, k, bands, threshold))
    val pri = df.select(col(idCol).as("id"), priorityExpr.as("__p"))
    val ranked = clusters.join(pri, Seq("id"))
    val keepers = ranked.groupBy(col("cluster_id"))
      .agg(min(struct(col("__p"), col("id"))).as("__keep"))
      .select(col("cluster_id"), col("__keep.id").as("__kid"))
    val losers = ranked.join(keepers, Seq("cluster_id"))
      .filter(col("id") =!= col("__kid"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Fixed-width word segments of each document: one row per `(id, seg_idx,
    * segment)`, where segment `i` is words `[i*segWords, (i+1)*segWords)` of
    * the whitespace-split text (the final segment may be shorter). The
    * segmentation itself is a pure codegen'd Column plan — `split` +
    * `sequence` + `slice` — so it is scan-shaped: no shuffle, no UDF, and
    * exactly reproducible in the SQL oracle via list slicing.
    */
  def segments(df: DataFrame, idCol: String, textCol: String,
      segWords: Int): DataFrame = {
    require(segWords >= 1, "segWords must be >= 1")
    // split once behind a projection boundary (see shingleRel)
    val arr = col("__w")
    val lastIdx = floor((size(arr) - lit(1)) / lit(segWords)).cast("int")
    val segArr = transform(
      sequence(lit(0), lastIdx),
      i => concat_ws(" ", slice(arr, i * segWords + 1, lit(segWords))))
    df.select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol), posexplode(segArr))
      .withColumnRenamed("pos", "seg_idx")
      .withColumnRenamed("col", "segment")
  }

  /** Corpus-wide frequency of every segment — the evidence table behind
    * [[scrubBoilerplate]], useful on its own for corpus forensics.
    */
  def segmentFrequencies(df: DataFrame, idCol: String, textCol: String,
      segWords: Int): DataFrame =
    segments(df, idCol, textCol, segWords)
      .groupBy(col("segment")).agg(count(lit(1)).as("freq"))

  /** Reassemble per-doc text from surviving `(id, seg_idx, segment)` rows,
    * in segment order. Docs with zero surviving segments disappear (group-by
    * semantics) — callers wanting them back can left-join the original ids.
    * `array_sort` on `struct(seg_idx, segment)` makes the collect order
    * deterministic regardless of shuffle arrival order.
    */
  private def reassemble(segs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    segs.groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(
          array_sort(collect_list(struct(col("seg_idx"), col("segment")))),
          s => s.getField("segment"))).as(textCol))

  /** Corpus-wide EXACT segment dedup, keep-first: every occurrence of a
    * repeated segment except the one with the smallest `(id, seg_idx)` is
    * removed, and each doc's text is reassembled from its surviving
    * segments (docs whose every segment was a later duplicate are dropped).
    * This is the span-level exact-substring dedup of Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better") restated
    * over fixed word windows — the repeated-span removal a training
    * pipeline runs after doc-level dedup.
    *
    * Shape at 100 TB: segmentation is scan-shaped, and the survivors ARE
    * the per-segment minima — so the whole operator is exactly two
    * aggregations, no join: `groupBy(segment).agg(min(struct(id,
    * seg_idx)))` (partial-aggregatable map-side, so a segment repeated a
    * billion times still combines before the exchange — no hot-key window
    * sort anywhere) and the doc-grain reassembly.
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 4): DataFrame = {
    val segs = segments(df, idCol, textCol, segWords)
    val kept = segs.groupBy(col("segment"))
      .agg(min(struct(col(idCol), col("seg_idx"))).as("__k"))
      .select(col("__k").getField(idCol).as(idCol),
        col("__k").getField("seg_idx").as("seg_idx"),
        col("segment"))
    reassemble(kept, idCol, textCol)
  }

  /** MAXIMAL repeated runs — the variable-length form of exact-substring
    * dedup (Lee et al. 2021's suffix-array pass, restated distributively
    * at word grain): every word position covered by a REPEATED `minWords`-
    * gram occurrence (other than the gram's corpus-canonical first
    * occurrence) is duplicate territory, and overlapping/adjacent covered
    * windows merge into maximal runs. Pigeonhole-complete for repeats of
    * ≥ `minWords` words: any such repeat is tiled by its k-gram windows,
    * so the reconstructed run boundaries are the true maximal extent —
    * unlike [[dedupSegments]]' fixed windows, which fragment a repeat
    * that straddles segment boundaries and miss its unaligned edges.
    * CAVEAT — not byte-exact like a suffix-array pass: repeats are keyed
    * on `xxhash64(gram)`, so a 64-bit collision between two DISTINCT
    * grams can mark a unique passage as repeated (and [[dedupSubstrings]]
    * would purge non-duplicate text). P(any collision) ≈ n²/2⁶⁵ over n
    * distinct grams — ~3·10⁻⁴ at a billion grams — accepted so the
    * shuffle never carries gram strings; verify candidate runs against
    * the raw text (join back on `(id, gpos)`) where that tail risk is
    * unacceptable.
    * Returns one row per `(id, run_start, run_len)` covered run (word
    * offsets).
    *
    * Shape at 100 TB: gram extraction is scan-shaped; the canonical/freq
    * pass is one map-side-combinable aggregation keyed on `xxhash64(gram)`
    * (the shuffle never carries gram strings — same discipline as the ER
    * variants join); the repeated-gram side is only duplicated occurrences
    * (a small fraction of the corpus), and the run merge is a window over
    * per-document grams — bounded by document length, never corpus-grain.
    */
  def duplicateRuns(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5): DataFrame = {
    require(minWords >= 2, "minWords must be >= 2")
    val k = minWords
    // split once behind a projection boundary (see shingleRel)
    val arr = col("__w")
    val grams = df
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .filter(size(arr) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), size(arr) - lit(k)),
        i => xxhash64(concat_ws(" ", slice(arr, i + 1, lit(k)))))))
      .withColumnRenamed("pos", "gpos")
      .withColumnRenamed("col", "__g")
    val canon = grams.groupBy(col("__g"))
      .agg(min(struct(col(idCol), col("gpos"))).as("__c"),
        count(lit(1)).as("__freq"))
      .filter(col("__freq") > 1)
      .select(col("__g"), col("__c").getField(idCol).as("__cid"),
        col("__c").getField("gpos").as("__cpos"))
    val covered = grams.join(canon, Seq("__g"))
      .filter(!(col(idCol) === col("__cid") && col("gpos") === col("__cpos")))
      .select(col(idCol), col("gpos"))
    // gaps-and-islands: length-k intervals sorted by start; a window start
    // at or before the running max end extends the current run
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("gpos"))
    val prevEnd = max(col("gpos") + lit(k))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val marked = covered.withColumn("__new",
      when(prevEnd.isNull || col("gpos") > prevEnd, 1L).otherwise(0L))
    marked.withColumn("__run",
      sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__run"))
      .agg(min(col("gpos")).as("run_start"),
        (max(col("gpos")) + lit(k)).as("__end"))
      .select(col(idCol), col("run_start"),
        (col("__end") - col("run_start")).as("run_len"))
  }

  /** Variable-length exact-substring DEDUP: remove every word inside a
    * [[duplicateRuns]] maximal repeated run (the canonical first
    * occurrence of each repeat survives uncovered), reassembling each
    * document from its surviving words. Documents whose entire text was
    * covered drop out, mirroring [[dedupSegments]]' group-by semantics.
    *
    * Shape at 100 TB: covered positions explode only from the (small)
    * runs relation, and the purge is an equi anti-join on `(id, wpos)` —
    * word rows are scan-shaped and the reassembly is the same bounded
    * per-document aggregation as [[dedupSegments]].
    */
  def dedupSubstrings(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5): DataFrame =
    dedupSubstringsWithRuns(df, idCol, textCol,
      duplicateRuns(df, idCol, textCol, minWords))

  /** [[dedupSubstrings]] from PRECOMPUTED [[duplicateRuns]] output — the
    * production shape: the detection pass (the corpus-linear gram
    * shuffle, ~1.1 M grams/s/node measured in tools/SubstringStress) runs
    * ONCE, its runs frame is audited/persisted, and the purge reuses it
    * instead of re-paying the shuffle inside its own plan. (Persisting
    * the runs frame also lets the composed [[dedupSubstrings]] hit
    * Spark's cache-fragment matching, but an explicit parameter beats
    * relying on CacheManager recognizing the subtree.)
    */
  def dedupSubstringsWithRuns(df: DataFrame, idCol: String, textCol: String,
      runs: DataFrame): DataFrame = {
    val coveredPos = runs.select(col(idCol),
      explode(sequence(col("run_start"),
        col("run_start") + col("run_len") - 1)).as("wpos"))
    val words = df.select(col(idCol), posexplode(split(col(textCol), " ")))
      .withColumnRenamed("pos", "wpos")
      .withColumnRenamed("col", "__w")
    words.join(coveredPos, Seq(idCol, "wpos"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(
          array_sort(collect_list(struct(col("wpos"), col("__w")))),
          s => s.getField("__w"))).as(textCol))
  }

  /** Boilerplate scrub, CCNet/RefinedWeb-style restated over fixed word
    * windows: remove EVERY occurrence of any segment whose corpus frequency
    * exceeds `maxFreq` (headers, footers, cookie banners — content that
    * repeats across the corpus far more than natural text), reassembling
    * each doc from what survives (docs that were pure boilerplate drop out).
    *
    * Shape at 100 TB: the boilerplate set (`freq > maxFreq`) is tiny
    * relative to the corpus and born from a map-side-combinable count; the
    * purge is a left-anti join against it — AQE broadcasts it when it fits,
    * and the build side never scales with corpus size, only with the number
    * of DISTINCT over-threshold segments.
    */
  def scrubBoilerplate(df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 3, maxFreq: Long = 2): DataFrame = {
    require(maxFreq >= 1, "maxFreq must be >= 1")
    val boiler = segmentFrequencies(df, idCol, textCol, segWords)
      .filter(col("freq") > maxFreq).select(col("segment"))
    val kept = segments(df, idCol, textCol, segWords)
      .join(boiler, Seq("segment"), "left_anti")
    reassemble(kept, idCol, textCol)
  }

  /** Partial-overlap candidate pairs via winnowing fingerprints
    * ([[TextAnalysis.winnowingFingerprints]]): docs sharing ≥ `minShared`
    * selected fingerprints, with the shared count as overlap evidence. This
    * detects CONTAINMENT — a paragraph of one doc embedded in another —
    * which whole-doc similarity (Jaccard/MinHash/SimHash/embedding) scores
    * near zero when the host document is large: any shared run of
    * ≥ `w + k − 1` words guarantees a shared fingerprint regardless of
    * the rest of either document.
    *
    * Shape at 100 TB: winnowing keeps ~1/w of gram hashes, so the posting
    * relation is a fraction of an inverted index; pair generation joins
    * through fingerprint posting lists and is quadratic ONLY in per-
    * fingerprint df — `maxPostings` drops fingerprints seen in more docs
    * than that (corpus boilerplate is overlap noise, not evidence; same
    * boundedness argument as the prefix-filter hot-token cap above), so
    * posting lists stay capped and the join never degenerates.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2,
      maxPostings: Int = 1000): DataFrame = {
    require(minShared >= 1 && maxPostings >= 2,
      "need minShared >= 1 and maxPostings >= 2")
    val fps = TextAnalysis.winnowingFingerprintRel(df, idCol, textCol, k, w)
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxPostings).select(col("fp"))
    val bounded = fps.join(keep, Seq("fp"))
    bounded.as("a")
      .join(bounded.as("b"),
        col("a.fp") === col("b.fp") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("i"), col(s"b.$idCol").as("j"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Eval-set decontamination — drop every corpus document that shares at
    * least `minHits` distinct n-word shingles with ANY document of the
    * (small) benchmark/eval set, the standard guard against test-set
    * leakage into training data.
    *
    * Shape at 100 TB: the eval shingle set is tiny (benchmarks are KBs to
    * MBs) — distinct'd once and hash-joined against the corpus shingle
    * stream (AQE broadcasts it), then a per-doc distinct-hit count and a
    * left-anti join. The corpus side is scan-shaped: no self-join, no
    * all-pairs anywhere. Shingles join as raw strings so the operator is
    * exactly reproducible in the SQL oracle; swap in `xxhash64(w)` on both
    * join sides if shingle text ever dominates the shuffle.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String,
      shingle: Int = 3, minHits: Int = 1): DataFrame =
    corpus.join(contaminatedIds(corpus, idCol, textCol, evalDf, evalTextCol,
      shingle, minHits), Seq(idCol), "left_anti")

  /** The id set [[decontaminate]] drops — exposed so audit/lineage
    * consumers share the exact stage logic instead of re-deriving it.
    * One column: `idCol`. */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String,
      shingle: Int = 3, minHits: Int = 1): DataFrame = {
    require(shingle >= 1 && minHits >= 1, "shingle and minHits must be >= 1")
    val evalShingles = shingleRel(
      evalDf.select(lit(0).as("__eid"), col(evalTextCol).as("__etext")),
      "__eid", "__etext", shingle)
      .select(col("w")).distinct()
    shingleRel(corpus, idCol, textCol, shingle)
      .join(evalShingles, Seq("w"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("w")).as("__hits"))
      .filter(col("__hits") >= minHits)
      .select(col(idCol))
  }

  /** Leakage AUDIT for [[decontaminate]]: per EVAL document, how many corpus
    * documents share ≥ `minHits` distinct shingles with it, plus the worst
    * and total per-pair hit counts — the report a benchmark owner reads
    * before trusting a decontaminated corpus (loss-accounting discipline,
    * like `importNamedReport` on the load path). Same scale shape as the
    * purge: the eval shingle relation is the tiny side (AQE broadcasts it),
    * the corpus side stays scan-shaped, grouping runs at (corpus doc, eval
    * doc) grain then per eval doc — integer evidence only, no all-pairs.
    */
  def decontaminationReport(corpus: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalIdCol: String, evalTextCol: String,
      shingle: Int = 3, minHits: Int = 1): DataFrame = {
    require(shingle >= 1 && minHits >= 1, "shingle and minHits must be >= 1")
    require(idCol != evalIdCol,
      "corpus and eval id columns must have distinct names (both appear at pair grain)")
    val evalShingles = shingleRel(evalDf, evalIdCol, evalTextCol, shingle)
      .select(col(evalIdCol), col("w")).distinct()
    shingleRel(corpus, idCol, textCol, shingle)
      .join(evalShingles, Seq("w"))
      .groupBy(col(idCol), col(evalIdCol))
      .agg(countDistinct(col("w")).as("hits"))
      .filter(col("hits") >= minHits)
      .groupBy(col(evalIdCol))
      .agg(count(lit(1)).as("n_contaminated"), max(col("hits")).as("max_hits"),
        sum(col("hits")).as("total_hits"))
  }

  /** [[decontaminate]] with a Bloom-filter PREFILTER on the corpus shingle
    * stream — the shape for when the eval/blocklist shingle set outgrows a
    * comfortable broadcast-hash build (contract suites + blocklists reach
    * tens of millions of shingles at production scale). Exactness is
    * preserved: Bloom filters have NO false negatives, so every truly
    * contaminated shingle survives the prefilter, and the exact equi-join
    * verify behind it removes the false positives — result is row-identical
    * to [[decontaminate]] (same oracle), only the plan differs.
    *
    * Spark-first mechanics: the filter is built DISTRIBUTED by Spark's own
    * `BloomFilterAggregate` over `xxhash64(shingle)` (the identical
    * aggregate/probe pair Catalyst's `InjectRuntimeFilter` uses for
    * runtime row-level filtering), so only the final serialized sketch —
    * `bitsPerItem`/8 bytes per `expectedEvalShingles`, ~1.25 MB per
    * million at the default 10 bits (~1% fpp) — ever reaches the driver.
    * The sketch is sized from the caller's estimate (the same
    * creation-side-estimate design as Spark's runtime filters) so build,
    * cardinality check, and sketch ship in ONE pass over the eval side;
    * an eval set larger than the estimate is detected from the count in
    * that same pass and refused (an under-sized Bloom silently degrades
    * to fpp→1, which stays CORRECT here — the verify join absorbs false
    * positives — but forfeits the prefilter's entire point). The probe
    * is a codegen'd `BloomFilterMightContain` predicate evaluated inside
    * the corpus scan stage: at 100 TB the corpus shingle relation never
    * shuffles; only the Bloom-passing sliver (true hits + ~fpp noise)
    * enters the verify join, whose build side is the eval set itself.
    *
    * NOTE: `BloomFilterAggregate` clamps its bit budget at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 64M
    * bits ≈ 6.7M items at 10 bits/item); estimates beyond that need the
    * conf raised or the fpp quietly rises (correctness unaffected).
    * Right-size `expectedEvalShingles`: the serialized sketch rides every
    * task closure of the probe stage, and an A/B at sf0.1 measured a
    * 1 MiB over-sized sketch costing ~25% of the whole query (3.1 s)
    * vs a right-sized 80 KiB one (2.4 s; the broadcast-exact path is
    * 2.0 s at this eval size — the bloom shape pays off as the eval set
    * grows, not here).
    *
    * ≙ reference has no decontamination; this extends the training-data
    * suite (SURVEY §2.16) alongside [[decontaminate]].
    */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String,
      shingle: Int = 3, minHits: Int = 1, bitsPerItem: Int = 10,
      expectedEvalShingles: Long = 1L << 20): DataFrame = {
    require(shingle >= 1 && minHits >= 1, "shingle and minHits must be >= 1")
    require(bitsPerItem >= 4 && bitsPerItem <= 64, "bitsPerItem must be in [4, 64]")
    require(expectedEvalShingles >= 1 && expectedEvalShingles <= 512L * 1024 * 1024,
      "expectedEvalShingles must be in [1, 512M] (sketch memory = bitsPerItem/8 bytes each)")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CatalystLiteral}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    // Bloom insertion is idempotent, so the BUILD pass skips the distinct:
    // one scan of the eval side + a 1-row aggregate, NO exchange. The
    // distinct relation below is only referenced by the verify join, where
    // it computes inside the main job (it bounds the join fan-out of
    // shingles repeated across eval documents).
    val evalShinglesRaw = shingleRel(
      evalDf.select(lit(0).as("__eid"), col(evalTextCol).as("__etext")),
      "__eid", "__etext", shingle)
      .select(col("w"))
    val evalShingles = evalShinglesRaw.distinct()
    val bloomAgg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col("w"))),
      CatalystLiteral(expectedEvalShingles),
      CatalystLiteral(expectedEvalShingles * bitsPerItem))
    val built = evalShinglesRaw
      .agg(Bridge.column(bloomAgg.toAggregateExpression()).as("bf"),
        approx_count_distinct(col("w")).as("n"))
      .head
    val nEval = built.getAs[Long]("n")
    // Best-effort undersize refusal: `n` is an HLL estimate (~2-5% error),
    // so compare against 95% of the declared capacity — a modestly-over
    // eval set is refused conservatively rather than slipping through on
    // estimator error. Correctness never depends on this (the verify join
    // absorbs false positives); only the prefilter's selectivity does.
    require(nEval <= (expectedEvalShingles * 0.95).toLong.max(1L),
      s"eval shingle set has ~$nEval distinct shingles (HLL estimate) > " +
        s"95% of expectedEvalShingles $expectedEvalShingles — the sketch " +
        "would risk undersizing (fpp degrades and the prefilter stops " +
        "filtering); pass a larger estimate")
    val bloomBytes = built.getAs[Array[Byte]]("bf")
    if (bloomBytes == null) corpus // empty eval set: nothing can contaminate
    else {
      val mightContain = Bridge.column(BloomFilterMightContain(
        CatalystLiteral.create(bloomBytes,
          org.apache.spark.sql.types.BinaryType),
        Bridge.expression(xxhash64(col("w")))))
      val contaminated = shingleRel(corpus, idCol, textCol, shingle)
        .filter(mightContain)
        .join(evalShingles, Seq("w"))
        .groupBy(col(idCol))
        .agg(countDistinct(col("w")).as("__hits"))
        .filter(col("__hits") >= minHits)
        .select(col(idCol))
      corpus.join(contaminated, Seq(idCol), "left_anti")
    }
  }

  /** The fingerprint index of an already-ingested corpus: one row per
    * distinct canonical fingerprint ([[TextAnalysis.canonicalFingerprint]]).
    * Persist it (bucketed by `fp` at scale) and hand it to [[novelOnly]] on
    * every subsequent intake batch or stream.
    */
  def fingerprintIndex(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(TextAnalysis.canonicalFingerprint(col(textCol)).as("fp"))
      .distinct()

  /** Novelty filter for continuous intake — batch AND streaming: attach
    * each incoming document's canonical fingerprint, keep the FIRST
    * occurrence per fingerprint (on a stream: stateful `dropDuplicates`
    * across micro-batches), and drop everything the static corpus index
    * already holds (stream-static `left_anti`, natively supported by
    * Structured Streaming). State is bounded by the count of distinct
    * NOVEL fingerprints — watermark upstream to bound it in time at
    * 100 TB/day intake. Emits the incoming columns plus `fp`.
    */
  def novelOnly(incoming: DataFrame, index: DataFrame, textCol: String): DataFrame =
    incoming.withColumn("fp", TextAnalysis.canonicalFingerprint(col(textCol)))
      .dropDuplicates("fp")
      .join(index, Seq("fp"), "left_anti")

  /** Banded MinHash signatures at the (id, band, bandHash) grain — the
    * candidate-generation key of [[minhashLshPairs]], factored out so an
    * INDEX of an ingested corpus and an intake batch compute the identical
    * banding.
    */
  private def bandedSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, shingle: Int): DataFrame = {
    val rows = k / bands
    // xxhash64 buckets like [[minhashCandidateStage]] (round 18) — the
    // 32-bit birthday term would manufacture false probe candidates
    // against a large index; index and probe share THIS definition, so
    // they can never disagree on the hash.
    minhashSignatures(df, idCol, textCol, k, shingle)
      .select(col(idCol), posexplode(array((0 until bands).map(bi =>
        xxhash64(lit(bi), slice(col("sig"), bi * rows + 1, rows))): _*)).as(Seq("band", "bh")))
  }

  /** NEAR-dup serving index of an ingested corpus — the lexical analog of
    * the `ivfFit`/`ivfTopKIndexed` fit-once/serve-many split: `bands`
    * (idx_id, band, bh) generates candidates, `words` (idx_id, ws) exact-
    * verifies them. Build ONCE per corpus; persist both (bands bucketed by
    * `bh` at scale so even a non-broadcast probe sort-merges with no index
    * exchange). The per-batch serving cost is one SCAN of each index table
    * — never a shuffle of either — so intake batch sizing is the
    * amortization lever (tools/IntakeStress: 2.3 s per 10k-doc batch
    * against a 1e6-doc index at local[32]). Signature parameters must
    * match between index and [[dropCorpusNearDups]] — they key the band
    * hashes.
    *
    * INDEX FORMAT: `bh` is the 64-bit `xxhash64(band, slice)` band bucket
    * (LongType) since round 18. An index PERSISTED with the earlier
    * 32-bit `hash()` buckets (IntegerType `bh`) can never match the
    * current probe hashes — an int/long equi-join coerces silently and
    * every near-dup would be admitted — so [[dropCorpusNearDups]] and
    * [[nearDupIndexAppend]] REJECT an integer `bh` column: rebuild such
    * an index with this method.
    */
  def nearDupIndex(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, shingle: Int = 1): (DataFrame, DataFrame) = {
    val b = bandedSignatures(corpus, idCol, textCol, k, bands, shingle)
      .select(col(idCol).as("idx_id"), col("band"), col("bh"))
    val w = corpus.select(col(idCol).as("idx_id"),
      shingleHashArr(col(textCol), shingle).as("ws"))
    (b, w)
  }

  /** Drop every incoming document with a VERIFIED near-dup in the indexed
    * corpus — the near-dup face of [[novelOnly]], and deliberately
    * order-independent: each incoming doc is judged against the STATIC
    * index only, so the result is the same at any batching (a stream can
    * apply it per micro-batch — [[graft.streaming.Streaming.nearDupNovelStream]]
    * — and a backfill can run it as one batch, byte-identically). Plan: the
    * batch sides (banded signatures, candidate ids, verified hit set) are
    * all bounded by the intake batch, so only the candidate probe touches
    * the corpus-sized index — an equi join on (band, bh) that bucket-prunes
    * against a bucketed index — and the hit set broadcasts into the final
    * anti join; the corpus is never shuffled. In-stream near-dups (intake
    * doc vs intake doc) are out of contract by design: exact repeats are
    * [[novelOnly]]'s job upstream, and near-dup residue WITHIN the admitted
    * stream is the periodic batch compaction's ([[purgeNearDups]]) — the
    * standard filter-at-intake + compact-at-rest split.
    */
  def dropCorpusNearDups(incoming: DataFrame, idCol: String, textCol: String,
      idxBands: DataFrame, idxWords: DataFrame, threshold: Double = 0.9,
      k: Int = 64, bands: Int = 16, shingle: Int = 1): DataFrame = {
    requireLongBandBuckets(idxBands, "dropCorpusNearDups")
    val inBands = bandedSignatures(incoming, idCol, textCol, k, bands, shingle)
      .select(col(idCol).as("__in"), col("band"), col("bh"))
    val cand = inBands.join(idxBands, Seq("band", "bh"))
      .select(col("__in"), col("idx_id")).distinct()
    val inWords = incoming.select(col(idCol).as("__in"),
      shingleHashArr(col(textCol), shingle).as("wi"))
    val hit = cand
      .join(inWords, Seq("__in"))
      .join(idxWords.select(col("idx_id"), col("ws").as("wj")), Seq("idx_id"))
      .withColumn("__inter", graft.functions.SortedIntersectCount(col("wi"), col("wj")))
      .withColumn("sim", col("__inter").cast("double") /
        (size(col("wi")) + size(col("wj")) - col("__inter")).cast("double"))
      .filter(col("sim") >= threshold)
      .select(col("__in")).distinct()
    // hit ⊆ the intake batch's ids — batch-bounded, never corpus-bounded
    incoming.join(broadcast(hit), incoming(idCol) === hit("__in"), "left_anti")
  }

  /** Grow a [[nearDupIndex]] with newly ADMITTED documents — the index
    * maintenance step that closes the continuous-intake loop (admit a
    * batch with [[dropCorpusNearDups]], then append it here so the NEXT
    * batch dedups against it too). Returns the `(bands, words)` pair in
    * the exact shape [[nearDupIndex]] builds: both sides compute through
    * the SAME shared signature relations ([[bandedSignatures]] /
    * `shingleHashArr`), so an index grown incrementally is ROW-IDENTICAL
    * to one rebuilt from the union corpus (spec-pinned) — append is a
    * union of batch-sized relations, never a corpus re-scan. On a
    * persisted index, write the new rows with `Append` into the same
    * bucketed layout instead of unioning frames.
    */
  def nearDupIndexAppend(idxBands: DataFrame, idxWords: DataFrame,
      admitted: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, shingle: Int = 1): (DataFrame, DataFrame) = {
    // unioning new long buckets into an int-bucket index would coerce the
    // old values to longs that never equal any probe hash — reject here
    // too, not just at probe time
    requireLongBandBuckets(idxBands, "nearDupIndexAppend")
    val (nb, nw) = nearDupIndex(admitted, idCol, textCol, k, bands, shingle)
    (idxBands.unionByName(nb), idxWords.unionByName(nw))
  }

  /** Fail loudly on a [[nearDupIndex]] persisted before the round-18
    * 64-bit band buckets (IntegerType `bh`): probing it with long
    * xxhash64 values silently matches NOTHING (int/long join keys
    * coerce), so every near-dup would be admitted.
    */
  private def requireLongBandBuckets(idxBands: DataFrame, op: String): Unit = {
    val bhType = idxBands.schema.fields.find(_.name == "bh").map(_.dataType)
    require(bhType.forall(_ == org.apache.spark.sql.types.LongType),
      s"$op: idxBands.bh is ${bhType.map(_.simpleString).getOrElse("absent")}, " +
      "expected bigint — this index predates the 64-bit band-bucket hash " +
      "(round 18) and cannot match current probe hashes; rebuild it with " +
      "nearDupIndex")
  }
}
