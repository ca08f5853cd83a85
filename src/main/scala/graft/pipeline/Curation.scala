package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * stratified sampling (language/source mixing) and per-stratum quality
  * selection. Both are single-pass shapes — the sampler is a pure codegen'd
  * filter (no shuffle, no RNG state), the selector one window shuffle on the
  * stratum key — so they scale linearly with corpus size.
  */
object Curation {

  /** Deterministic stratified sampling: a row is kept iff the first 4 hex
    * digits of `md5(id + ":" + salt)` fall lexicographically below the
    * stratum's threshold, `floor(rate · 65536)` as zero-padded lowercase hex
    * (rate ≥ 1.0 → "g", which every hex digit sorts below → keep all; rate
    * granularity 1/65536). No RNG state and no shuffle: the same
    * (id, salt, rates) selects the same subset at any cluster size or
    * partitioning — reproducible training mixes, re-runnable incrementally.
    * Changing `salt` draws an independent sample.
    *
    * Rates are per stratum VALUE (e.g. "en" -> 1.0, "zh" -> 0.25);
    * unlisted strata use `defaultRate`.
    */
  def sampleStratified(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String): DataFrame = {
    def thr(r: Double): String =
      if (r >= 1.0) "g" else f"${math.max(0.0, math.floor(r * 65536)).toInt}%04x"
    val thrCol = rates.foldLeft(lit(thr(defaultRate))) { case (acc, (k, r)) =>
      when(stratumCol === k, lit(thr(r))).otherwise(acc)
    }
    df.filter(substring(md5(concat(idCol.cast("string"), lit(":" + salt))), 1, 4) < thrCol)
  }

  /** Deterministic stratified RESAMPLING — [[sampleStratified]] extended to
    * rates above 1.0 for domain upsampling (training-mix epochs per source):
    * every row yields `floor(rate)` whole copies plus one more iff the same
    * md5-threshold draw as [[sampleStratified]] selects it for the
    * fractional remainder. Output carries a `copy` index (0-based) so
    * repeated rows stay distinguishable downstream (shufflable, groupable).
    *
    * Same determinism contract: no RNG state, no shuffle — a pure
    * scan-shaped explode whose output is identical at any partitioning, so
    * a 100 TB mix is reproducible and resumable. `rates` ≤ 1.0 reproduce
    * [[sampleStratified]] exactly (with `copy = 0`).
    */
  def resampleStratified(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String): DataFrame = {
    require(!df.columns.contains("copy"),
      "resampleStratified emits a `copy` output column; rename the input's `copy` first")
    def fracThr(r: Double): String = {
      val frac = r - math.floor(r)
      f"${math.max(0.0, math.floor(frac * 65536)).toInt}%04x"
    }
    val wholeCol = rates.foldLeft(lit(math.floor(defaultRate).toInt)) {
      case (acc, (k, r)) => when(stratumCol === k, lit(math.floor(r).toInt)).otherwise(acc)
    }
    val thrCol = rates.foldLeft(lit(fracThr(defaultRate))) { case (acc, (k, r)) =>
      when(stratumCol === k, lit(fracThr(r))).otherwise(acc)
    }
    val extra = when(
      substring(md5(concat(idCol.cast("string"), lit(":" + salt))), 1, 4) < thrCol, 1)
      .otherwise(0)
    val n = wholeCol + extra
    // guard: sequence(0, -1) would generate a DESCENDING [0, -1] — empty
    // array (dropped by explode) is the correct zero-copy case
    df.withColumn("copy", explode(when(n > 0, sequence(lit(0), n - 1))
      .otherwise(array().cast("array<int>"))))
  }

  /** Exactly-k-per-stratum deterministic sample — the eval/calibration-set
    * carve: rank each stratum's documents by the same md5 draw family as
    * [[sampleStratified]] (id-salted, so a given (id, salt) always draws
    * the same position) and keep the k smallest. Unlike rate-based
    * sampling, the output size is EXACT per stratum (min(k, n_s)) — what a
    * held-out set needs. One window shuffle on the stratum key; ordering
    * ties are impossible (md5 over distinct ids, id tiebreak), so the
    * result is identical at any partitioning.
    */
  def sampleExactK(df: DataFrame, idCol: Column, stratumCol: Column,
      k: Int, salt: String): DataFrame = {
    require(k > 0, s"sampleExactK: k must be positive, got $k")
    val draw = md5(concat(idCol.cast("string"), lit(":" + salt)))
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(stratumCol).orderBy(draw, idCol)))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Temperature-based (α) corpus rebalancing — the standard multilingual /
    * multi-domain mixing policy (mT5/XLM-R style): sample strata with
    * probability q_s ∝ (n_s/N)^α, i.e. α=1 keeps natural proportions, α=0
    * gives every stratum an equal share of the budget, 0<α<1 upweights
    * low-resource strata smoothly. Per-stratum replication rates follow as
    * `r_s = ((q_s/Z) · budgetDocs) / n_s` (that exact association order —
    * mirrored by the gate's oracle so the 1/65536 thresholds are
    * bit-identical) and the mix materializes through
    * [[resampleStratified]]'s deterministic md5 draws: same data + α +
    * budget + salt ⇒ the same corpus at any cluster size.
    *
    * Scale shape: ONE aggregation for the per-stratum counts (bounded:
    * strata are languages/domains — a catalog, collected like every other
    * driver-resident catalog here), then the pure scan-shaped resample —
    * no additional shuffle at any corpus size. The gate pins α=0 (pow-free
    * arithmetic is exactly reproducible in the oracle); α>0 goes through
    * `math.pow` and is spec-pinned instead (CurationSpec) — same code
    * path, rates differ only in the driver-side map.
    */
  def temperatureResample(df: DataFrame, idCol: Column, stratumCol: Column,
      alpha: Double, budgetDocs: Long, salt: String): DataFrame = {
    require(alpha >= 0.0, s"temperatureResample: alpha must be >= 0, got $alpha")
    val counts = df.groupBy(stratumCol.as("__s")).agg(count(lit(1)).as("__n"))
      .collect().map { r =>
        // a null stratum (e.g. missing language tags) must fail LOUDLY here,
        // not NPE mid-map: the α-weights are computed over the whole corpus,
        // so silently dropping a null stratum would skew every rate
        require(!r.isNullAt(0), "temperatureResample: null stratum value in " +
          "the corpus — fill or filter the stratum column before mixing")
        r.get(0).toString -> r.getLong(1)
      }
      .sortBy(_._1) // deterministic summation order for Z
    require(counts.nonEmpty, "temperatureResample: empty corpus")
    val nTotal = counts.map(_._2).sum.toDouble
    val pows = counts.map { case (s, n) => (s, math.pow(n / nTotal, alpha), n) }
    val z = pows.map(_._2).sum
    val rates = pows.map { case (s, p, n) =>
      s -> ((p / z) * budgetDocs.toDouble) / n.toDouble
    }.toMap
    resampleStratified(df, idCol, stratumCol, rates, defaultRate = 0.0, salt)
  }

  /** The composed corpus-in → training-mix-out pipeline a pretraining user
    * actually runs, each stage the scale shape documented on its operator:
    *
    *   1. near-dup purge   — MinHash-LSH pairs → connected components →
    *                         keep canonical representative ([[TextDedup.purgeNearDups]])
    *   2. decontamination  — drop docs overlapping the eval set
    *                         ([[TextDedup.decontaminate]], broadcast eval shingles)
    *   3. quality floor    — codegen'd score filter ([[TextAnalysis.qualityColumns]])
    *   4. stratified resample — deterministic domain mixing, rates > 1
    *                         upsample ([[resampleStratified]])
    *
    * Stage order is part of the contract (dedup before decontamination
    * keeps the purge's canonical-representative choice independent of the
    * eval set; quality before resampling so upsampling never multiplies
    * junk). Output carries (original columns + `quality` + `copy`).
    */
  def curateCorpus(df: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String,
      qualityFloor: Double, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.9,
      shingle: Int = 3, minHits: Int = 2): DataFrame = {
    require(!df.columns.contains("quality"),
      "curateCorpus emits a `quality` output column; rename the input's `quality` first")
    val deduped = TextDedup.purgeNearDups(df, idCol, textCol, k, bands, threshold)
    val clean = TextDedup.decontaminate(deduped, idCol, textCol,
      evalDf, evalTextCol, shingle, minHits)
    val scored = clean.withColumn("quality",
      TextAnalysis.qualityColumns(col(textCol)).toMap.apply("quality"))
    val kept = scored.filter(col("quality") >= qualityFloor)
    resampleStratified(kept, col(idCol), stratumCol, rates, defaultRate, salt)
  }

  /** [[curateCorpus]] widened with the SEMANTIC decontamination stage:
    * additionally drop documents whose embedding sits within `cosThreshold`
    * cosine of ANY eval embedding ([[Similarity.semanticContaminationPairs]]
    * — catches paraphrased eval leakage the shingle overlap misses).
    * Composed as an id-level anti join on [[curateCorpus]]'s OUTPUT, which
    * is provably stage-order-sound: every decontamination stage, the
    * quality floor, and the per-id deterministic resample are independent
    * row filters/expansions that commute with one another — only the
    * purge's canonical-representative choice must come first, and it still
    * runs on the full corpus inside [[curateCorpus]]. The contaminated id
    * set is eval-scale, so the extra stage is one broadcast anti join.
    */
  def curateCorpusSemantic(df: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String,
      emb: DataFrame, embIdCol: String, embVecCol: String,
      evalEmb: DataFrame, cosThreshold: Double,
      qualityFloor: Double, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.9,
      shingle: Int = 3, minHits: Int = 2): DataFrame = {
    val out = curateCorpus(df, idCol, textCol, evalDf, evalTextCol,
      qualityFloor, stratumCol, rates, defaultRate, salt,
      k, bands, threshold, shingle, minHits)
    val bad = Similarity
      .semanticContaminationPairs(emb, evalEmb, cosThreshold, embIdCol, embVecCol)
      .select(col("corpus_id")).distinct()
    out.join(broadcast(bad), out(idCol) === bad("corpus_id"), "left_anti")
  }

  /** Curation LINEAGE: the audit table a governed training-data run keeps
    * next to [[curateCorpus]]'s output — EVERY input document with the
    * disposition the pipeline gave it and how many copies survived.
    * Dispositions follow the stage order (first failing stage wins, so the
    * audit is consistent with what the pipeline actually did):
    * `duplicate` → `contaminated` → `low_quality` → `sampled_out`
    * (kept by every filter, resampled to zero copies) → `kept`.
    *
    * Stage memberships are derived by THE SAME operators the pipeline
    * runs ([[TextDedup.dedupClusters]] losers, [[TextDedup.contaminatedIds]]
    * on the deduped corpus, the [[TextAnalysis.qualityColumns]] floor,
    * [[resampleStratified]] copy counts) — reused, not re-implemented, so
    * lineage can never drift from the pipeline. Invariant by construction:
    * Σ copies over this table == row count of the curated output.
    *
    * Scale shape: each membership is an id-grain frame joined back to the
    * corpus (left joins on the id — AQE broadcasts the small drop sets);
    * no stage is recomputed more than the pipeline itself computes it.
    */
  def curateLineage(df: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String,
      qualityFloor: Double, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.9,
      shingle: Int = 3, minHits: Int = 2): DataFrame = {
    val id = col(idCol)
    val dups = TextDedup
      .dedupClusters(TextDedup.minhashLshPairs(df, idCol, textCol, k, bands, threshold))
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol), lit(true).as("__dup"))
    val deduped = df.join(dups.select(id), Seq(idCol), "left_anti")
    val cont = TextDedup.contaminatedIds(deduped, idCol, textCol,
        evalDf, evalTextCol, shingle, minHits)
      .select(id, lit(true).as("__cont"))
    val scored = df.withColumn("__q",
      TextAnalysis.qualityColumns(col(textCol)).toMap.apply("quality"))
    val kept = scored.join(dups.select(id), Seq(idCol), "left_anti")
      .join(cont.select(id), Seq(idCol), "left_anti")
      .filter(col("__q") >= qualityFloor)
    val copies = resampleStratified(kept, id, stratumCol, rates, defaultRate, salt)
      .groupBy(id).agg(count(lit(1)).as("__copies"))
    scored
      .join(dups, Seq(idCol), "left")
      .join(cont, Seq(idCol), "left")
      .join(copies, Seq(idCol), "left")
      .withColumn("copies", coalesce(col("__copies"), lit(0L)))
      .withColumn("disposition",
        when(col("__dup"), "duplicate")
          .when(col("__cont"), "contaminated")
          .when(col("__q") < qualityFloor, "low_quality")
          .when(col("copies") === 0L, "sampled_out")
          .otherwise("kept"))
      .drop("__dup", "__cont", "__q", "__copies")
  }

  /** Per-stratum quality selection: the k best rows of each stratum by
    * `scoreCol`, ties broken by id for determinism. One shuffle on the
    * stratum key; with a bounded stratum count and k, AQE handles skew and
    * the window never materializes more than a partition.
    *
    * Output contract: the result carries a `rank` column (1 = best in
    * stratum). The input must not already have one — silently overwriting a
    * caller's column would corrupt it, so that is rejected loudly.
    */
  def topKPerStratum(df: DataFrame, idCol: Column, stratumCol: Column,
      scoreCol: Column, k: Int): DataFrame = {
    require(!df.columns.contains("rank"),
      "topKPerStratum emits a `rank` output column; rename the input's `rank` first")
    val w = Window.partitionBy(stratumCol).orderBy(scoreCol.desc, idCol.asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sequence packing — concat-and-cut: documents are concatenated in
    * deterministic id order within each stratum and the token stream is cut
    * into fixed `contextSize` windows (the standard pretraining batch prep).
    * Each document is assigned the pack its FIRST token lands in:
    * `pack_id = start_offset / contextSize`, `start_in_pack = start_offset %
    * contextSize` (a document may spill into the next pack — concat-and-cut
    * semantics, not bin packing, which is inherently sequential and does not
    * distribute).
    *
    * One window shuffle on the stratum key, cumulative sum per stratum —
    * deterministic at any partitioning. At 100 TB a handful of huge strata
    * would serialize the window; use [[packSequencesBucketed]] there — it
    * packs within composite (stratum × id-hash-bucket) strata, so
    * sub-stratifying only adds one partial tail pack per bucket.
    *
    * Output: input columns + (`n_tokens`, `pack_id`, `start_in_pack`).
    */
  def packSequences(df: DataFrame, idCol: Column, stratumCol: Column,
      tokensCol: Column, contextSize: Int): DataFrame = {
    require(contextSize > 0, s"contextSize must be positive, got $contextSize")
    Seq("n_tokens", "pack_id", "start_in_pack", "__start").foreach(c =>
      require(!df.columns.contains(c),
        s"packSequences emits or overwrites a `$c` column; rename the input's `$c` first"))
    packCore(df, idCol, tokensCol, contextSize, Seq(stratumCol), identity)
  }

  /** The one packing core both variants share — cumulative-sum window over
    * `partitionCols` in id order, concat-and-cut offsets — so the two can
    * never drift semantically. `packId` maps the per-partition pack ordinal
    * to the emitted id (identity, or bucket-prefixed).
    */
  private def packCore(df: DataFrame, idCol: Column, tokensCol: Column,
      contextSize: Int, partitionCols: Seq[Column],
      packId: Column => Column): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", packId((col("__start") / contextSize).cast("long")))
      .withColumn("start_in_pack", col("__start") % contextSize)
      .drop("__start")
  }

  /** Bucketed sequence packing — the 100 TB shape [[packSequences]]'s
    * scaladoc promises: a handful of huge strata (one giant `lang`) would
    * serialize its cumulative-sum window on one task, so the effective
    * stratum becomes the composite (stratum × hash-bucket of id). Window
    * parallelism multiplies by `nBuckets`; packs still never cross a
    * (stratum, bucket) pair, so the only cost vs [[packSequences]] is at
    * most ONE partial tail pack per bucket instead of one per stratum.
    *
    * The bucket hash is the same portable md5-hex construction as
    * [[sampleStratified]] (any engine with md5 reproduces the layout —
    * deliberately NOT xxhash64, which other engines cannot mirror): the
    * first 8 hex digits (32 bits — wide enough that `mod nBuckets` stays
    * uniform for any allowed nBuckets) of `md5(id ++ ":" ++ salt)` mod
    * `nBuckets`.
    *
    * Pack ids are bucket-unique by construction — the bucket sits in the
    * high bits (`pack_id = bucket·2⁴⁰ + per-bucket pack`): ids stay longs,
    * never collide across buckets, and decode trivially (`pack_id >> 40` =
    * bucket, low 40 bits = pack ordinal). 2⁴⁰ packs × contextSize tokens
    * per (stratum, bucket) is beyond any real corpus.
    *
    * Output: input columns + (`bucket`, `n_tokens`, `pack_id`,
    * `start_in_pack`).
    */
  def packSequencesBucketed(df: DataFrame, idCol: Column, stratumCol: Column,
      tokensCol: Column, contextSize: Int, nBuckets: Int,
      salt: String = "pk"): DataFrame = {
    require(contextSize > 0, s"contextSize must be positive, got $contextSize")
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets must be in 1..65536, got $nBuckets")
    Seq("bucket", "n_tokens", "pack_id", "start_in_pack", "__start").foreach(c =>
      require(!df.columns.contains(c),
        s"packSequencesBucketed emits or overwrites a `$c` column; rename the input's `$c` first"))
    val hex = substring(md5(concat(idCol.cast("string"), lit(":" + salt))), 1, 8)
    val bucket = pmod(conv(hex, 16, 10).cast("long"), lit(nBuckets)).cast("int")
    packCore(df.withColumn("bucket", bucket), idCol, tokensCol, contextSize,
      Seq(stratumCol, col("bucket")),
      local => shiftleft(col("bucket").cast("long"), 40) + local)
  }

  /** Token-budget corpus mixing — the "sample each domain down to its token
    * allocation" step of assembling a pretraining mix (rates say HOW OFTEN,
    * budgets say HOW MUCH): per stratum, documents are drawn in a
    * deterministic pseudo-random order (the same md5 draw as
    * [[sampleStratified]], id tie-break) and kept while the RUNNING token
    * total stays within the stratum's budget — a greedy prefix, so the
    * selected set is a function of (ids, salt, budgets) alone, identical at
    * any partitioning or cluster size. A document that would overflow the
    * budget is dropped but later smaller documents may still fit (the
    * filter is per-row `cum ≤ budget`, not a hard cut at first overflow) —
    * that fills budgets tighter and keeps the predicate scan-shaped after
    * the one cumulative-sum window per stratum.
    *
    * Budgets are per stratum VALUE; unlisted strata use `defaultBudget`.
    * `defaultBudget = Long.MaxValue` keeps unlisted strata whole.
    *
    * Output: input columns + `cum_tokens` (the running total INCLUDING this
    * row — callers can audit how full each budget ran).
    */
  def mixtureByTokenBudget(df: DataFrame, idCol: Column, stratumCol: Column,
      tokensCol: Column, budgets: Map[String, Long], defaultBudget: Long,
      salt: String): DataFrame = {
    require(!df.columns.contains("cum_tokens"),
      "mixtureByTokenBudget emits a `cum_tokens` output column; rename the input's `cum_tokens` first")
    val draw = substring(md5(concat(idCol.cast("string"), lit(":" + salt))), 1, 8)
    val w = Window.partitionBy(stratumCol).orderBy(draw.asc, idCol.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, b)) =>
      when(stratumCol === k, lit(b)).otherwise(acc)
    }
    df.withColumn("cum_tokens", sum(tokensCol.cast("long")).over(w))
      .filter(col("cum_tokens") <= budgetCol)
  }

  /** Bucketed token-budget mixing — the 100 TB shape of
    * [[mixtureByTokenBudget]], same split as [[packSequencesBucketed]]:
    * one giant stratum would serialize its cumulative-sum window, so the
    * stratum's budget is divided evenly across `nBuckets` md5-hash buckets
    * (`budget / nBuckets`, integer floor) and the greedy prefix runs per
    * (stratum, bucket). Window parallelism multiplies by `nBuckets`; the
    * cost is approximation, and it is BOUNDED: each bucket under-fills by
    * at most one document's tokens plus the floor remainder, so the
    * selected total differs from the exact variant by at most
    * `nBuckets · (maxDocTokens + 1)` tokens per stratum — negligible when
    * budgets are millions of documents deep, which is exactly when the
    * bucketing is needed. The draw stays the SAME md5 order, so bucket
    * membership and within-bucket order are both engine-independent.
    *
    * Output: input columns + (`bucket`, `cum_tokens`).
    */
  def mixtureByTokenBudgetBucketed(df: DataFrame, idCol: Column,
      stratumCol: Column, tokensCol: Column, budgets: Map[String, Long],
      defaultBudget: Long, salt: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets must be in 1..65536, got $nBuckets")
    Seq("bucket", "cum_tokens").foreach(c =>
      require(!df.columns.contains(c),
        s"mixtureByTokenBudgetBucketed emits a `$c` output column; rename the input's `$c` first"))
    val draw = substring(md5(concat(idCol.cast("string"), lit(":" + salt))), 1, 8)
    val bucket = pmod(conv(draw, 16, 10).cast("long"), lit(nBuckets)).cast("int")
    val w = Window.partitionBy(stratumCol, col("bucket")).orderBy(draw.asc, idCol.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-bucket budgets divide DRIVER-SIDE (exact integer floor — Column./
    // is double division, a silently different semantic for odd budgets)
    val budgetCol = budgets.foldLeft(lit(defaultBudget / nBuckets)) {
      case (acc, (k, b)) => when(stratumCol === k, lit(b / nBuckets)).otherwise(acc)
    }
    df.withColumn("bucket", bucket)
      .withColumn("cum_tokens", sum(tokensCol.cast("long")).over(w))
      .filter(col("cum_tokens") <= budgetCol)
  }

  /** Token-bounded output sharding — the export step after curation: assign
    * whole documents (never split, unlike [[packSequences]]) to size-bounded
    * shards, webdataset/tfrecord style. A document lands in the shard where
    * its first token falls: `shard_id = floor(exclusive-cumsum(tokens) /
    * maxTokensPerShard)` per stratum in id order — ONE cumulative-sum
    * window on the stratum key, deterministic at any partitioning, and a
    * writer can then `repartition($"stratum", $"shard_id")` to emit one
    * file per shard. Shard token totals land within ±(max doc tokens) of
    * the cap; the never-split contract is what a doc-granular reader
    * needs. For a single huge stratum, pre-bucket ids exactly as
    * [[packSequencesBucketed]] does — same composite-stratum story.
    */
  def assignShards(df: DataFrame, idCol: Column, stratumCol: Column,
      tokensCol: Column, maxTokensPerShard: Long): DataFrame = {
    require(maxTokensPerShard > 0,
      s"maxTokensPerShard must be positive, got $maxTokensPerShard")
    Seq("n_tokens", "shard_id", "__off").foreach(c =>
      require(!df.columns.contains(c),
        s"assignShards emits or overwrites a `$c` column; rename the input's `$c` first"))
    val w = Window.partitionBy(stratumCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("__off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integral `div`, not `/`: Column./ is double division, and the
      // cumulative offset of a 100 TB corpus sits near double's exact range
      .withColumn("shard_id", expr(s"__off div ${maxTokensPerShard}L"))
      .drop("__off")
  }

  /** Cumulative md5-bucket boundaries for [[splitCorpus]]: one
    * `(name, exclusive upper threshold as 4 hex digits)` per split EXCEPT
    * the last, which absorbs the remainder so the partition is total.
    * Exposed so a SQL oracle can restate the exact CASE the engine runs.
    */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, String)] = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0.0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be distinct")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.init.zip(cum.init).map { case ((n, _), c) =>
      (n, f"${math.floor(c * 65536).toInt}%04x")
    }
  }

  /** Deterministic train/val/test SPLIT: route each row to the first split
    * whose cumulative md5 bucket its draw falls in — the same portable
    * `md5(key + ":" + salt)` draw family as [[sampleStratified]], so the
    * assignment is a pure scan column: no RNG state, no shuffle, identical
    * at any partitioning, reproducible and resumable at 100 TB. Emits the
    * input plus a `split` column; the partition is total and disjoint by
    * construction (the last split absorbs the remainder bucket).
    *
    * Split on a DOCUMENT key only when leakage through near-duplicates is
    * already purged; otherwise use [[splitByCluster]], which routes whole
    * near-dup clusters together — the eval-honesty requirement documents
    * that split train/test across a shared near-dup pair silently violate.
    */
  def splitCorpus(df: DataFrame, keyCol: Column,
      splits: Seq[(String, Double)], salt: String): DataFrame = {
    require(!df.columns.contains("split"),
      "splitCorpus emits a `split` output column; rename the input's `split` first")
    val chain = splitThresholds(splits)
    val draw = substring(md5(concat(keyCol.cast("string"), lit(":" + salt))), 1, 4)
    val splitCol = chain.reverse.foldLeft(lit(splits.last._1)) {
      case (acc, (n, thr)) => when(draw < lit(thr), lit(n)).otherwise(acc)
    }
    df.withColumn("split", splitCol)
  }

  /** [[splitCorpus]] at near-dup-CLUSTER granularity: every document of a
    * cluster draws with the cluster's label as the key, so near-duplicates
    * can never straddle a split boundary (no train→test leakage through
    * paraphrase-grade copies). `clusters` is a `(idCol, clusterIdCol)`
    * frame — [[TextDedup.dedupClusters]] output — which contains only
    * PAIRED documents; singletons (absent from it) draw with their own id.
    * The cluster frame is orders smaller than the corpus (only near-dup
    * members appear), so AQE broadcasts the join at scale.
    */
  def splitByCluster(df: DataFrame, idCol: String, clusters: DataFrame,
      clusterIdCol: String, splits: Seq[(String, Double)],
      salt: String): DataFrame = {
    // Draw on STRING keys: a long-cast would null out non-numeric document
    // ids, turning every when() branch null-false and silently dumping all
    // such rows into the last split (and sharing one draw). String casts
    // are total, and for integral ids produce the same digits the long
    // path did, so numeric-id gate hashes are unchanged.
    val c = clusters.select(col(idCol), col(clusterIdCol).cast("string").as("__cl"))
    splitCorpus(
      df.join(c, Seq(idCol), "left")
        .withColumn("__k", coalesce(col("__cl"), col(idCol).cast("string"))),
      col("__k"), splits, salt)
      .drop("__cl", "__k")
  }

  /** Snapshot DIFF between two corpus versions: one row per document id
    * with status `added` / `removed` / `changed` / `unchanged` (content
    * compared by exact fingerprint) — the audit a dataset iteration
    * publishes next to its new snapshot so consumers see what moved. One
    * full-outer equi-join on the id; fingerprints are inline scan columns,
    * so the shuffle carries (id, 32-byte digest), never the text.
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("__ofp"))
    val n = newDf.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("__nfp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ofp").isNull, "added")
          .when(col("__nfp").isNull, "removed")
          .when(col("__ofp") === col("__nfp"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Leakage AUDIT for a split assignment: given the near-dup PAIRS, count
    * pairs per unordered `(split_a, split_b)` combination — off-diagonal
    * rows are train→test leakage through paraphrase-grade copies, the
    * number a doc-grain [[splitCorpus]] admits and [[splitByCluster]]
    * drives to zero (spec-pinned). Same loss-accounting discipline as
    * [[graft.pipeline.TextDedup.decontaminationReport]]: the report is
    * read BEFORE trusting the split. Pair-grain joins against the (small)
    * assignment projection — integer evidence only.
    */
  def splitLeakageReport(assign: DataFrame, idCol: String, splitCol: String,
      pairs: DataFrame, iCol: String = "i", jCol: String = "j"): DataFrame = {
    val ai = assign.select(col(idCol).as("__li"), col(splitCol).as("__sa"))
    val aj = assign.select(col(idCol).as("__lj"), col(splitCol).as("__sb"))
    pairs.join(ai, col(iCol) === col("__li"))
      .join(aj, col(jCol) === col("__lj"))
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
  }
}
