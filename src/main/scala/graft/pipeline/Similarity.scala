package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Numeric convention: embeddings are quantized to integers
  * (`round(x·1000)`) before any dot product, so similarities are computed
  * from EXACT integer dots — bit-identical regardless of row order,
  * partitioning, or engine (the DuckDB oracle reproduces them exactly).
  */
object Similarity {

  /** `Array[Float]` → exact integer vector (×1000, rounded). */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native codegen'd
    * Catalyst expression ([[graft.functions.LongDotProduct]]); the
    * `aggregate(zip_with(...))` built-in form evaluates lambdas interpreted.
    */
  def dotQ(a: Column, b: Column): Column = graft.functions.GraftFunctions.dot_q(a, b)

  /** Cosine from quantized vectors — double ops over exact integers. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus — a broadcast nested-loop whose cost is linear in the corpus and
    * embarrassingly parallel; the per-query top-k is a window on (qid).
    * This is the exact baseline; [[lshTopK]] is the sublinear scale path.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("sim", dotQ(col("qv"), col("cv")).cast("double") /
        (sqrt(dotQ(col("qv"), col("qv")).cast("double")) *
          sqrt(dotQ(col("cv"), col("cv")).cast("double"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Deterministic random hyperplanes (fixed seed) for sign-LSH. */
  private def hyperplanes(dim: Int, nPlanes: Int, table: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(1000L * table + 7)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket signature: one bit per hyperplane — a codegen'd
    * Catalyst expression evaluating all planes in one loop
    * ([[graft.functions.SignLshBits]]).
    */
  private def signature(vec: Column, planes: Array[Array[Double]]): Column =
    graft.functions.SignLshBits(vec, planes)

  /** Approximate cosine top-k via multi-table sign-LSH: candidates share a
    * bucket in ≥1 of `tables` signature tables (union via posexplode), then
    * exact re-rank of candidates only. Shuffles on bucket keys — sublinear
    * probe cost at corpus scale; recall tunable via tables × planes.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, nPlanes: Int = 6, tables: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigCols = (0 until tables).map(t =>
      signature(col(vecCol), hyperplanes(dim, nPlanes, t)).as(s"sig_$t"))
    def bucketed(df: DataFrame, id: String) =
      df.select(col(idCol).as(id) +: col(vecCol).as(s"v_$id") +: sigCols: _*)
        .select(col(id), col(s"v_$id"), posexplode(
          array((0 until tables).map(t => col(s"sig_$t")): _*)).as(Seq("table", "sig")))
    val cb = bucketed(corpus, "cand_id")
    val qb = bucketed(queries, "query_id")
    val cand = qb.join(cb, Seq("table", "sig"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("v_query_id").as("qv0"), col("cand_id"),
        col("v_cand_id").as("cv0"))
      .distinct()
    val scored = cand
      .withColumn("qv", quantize(col("qv0"))).withColumn("cv", quantize(col("cv0")))
      .withColumn("sim", dotQ(col("qv"), col("cv")).cast("double") /
        (sqrt(dotQ(col("qv"), col("qv")).cast("double")) *
          sqrt(dotQ(col("cv"), col("cv")).cast("double"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * (fixed seed) partitions the corpus into `nCentroids` cells; each query
    * probes its `nProbe` nearest cells and exact-re-ranks only those
    * candidates. The classic sublinear ANN layout: probe cost ≈
    * corpus × nProbe / nCentroids, and the cell assignment is a plain
    * column the corpus can be partitioned/bucketed by at 100 TB.
    */
  /** A fitted IVF index: the k-means cell centroids (driver-resident model
    * output, bounded by nCentroids) plus the cell-assigned corpus
    * (`cand_id, cv0, __cell`) — fit ONCE offline, query many times. At
    * 100 TB the assigned frame is persisted (ideally bucketed by `__cell`
    * so a probe's cells prune at the scan); every query batch is then a
    * bounded fan-out join against it, no refit. [[ivfTopK]] is the
    * fit+query convenience composition of [[ivfFit]]+[[ivfTopKIndexed]].
    */
  final case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Fit the IVF coarse quantizer on a bounded hash-ordered sample (no full
    * count) and assign every corpus vector to its cell. */
  def ivfFit(corpus: DataFrame, nCentroids: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Long = 200_000L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val corpusVec = corpus.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("__fv"))
    val trainSet = trainSample(corpusVec, idCol, trainCap)
    val km = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("__fv").setPredictionCol("__cell")
    val model = km.fit(trainSet)
    IvfIndex(model.clusterCenters.map(_.toArray),
      model.transform(corpusVec)
        .select(col(idCol).as("cand_id"), col(vecCol).as("cv0"), col("__cell")))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Long = 200_000L): DataFrame =
    ivfTopKIndexed(ivfFit(corpus, nCentroids, idCol, vecCol, trainCap),
      queries, k, nProbe, idCol, vecCol)

  /** Persist a fitted IVF index for cross-session serving: the assigned
    * corpus lands PARTITIONED BY its cell id — the layout [[IvfIndex]]'s
    * doc promises, so a probe's cells prune at the SCAN (read nProbe /
    * nCentroids of the corpus, not all of it) — with the centroids as a
    * tiny `<table>_centroids` sidecar. Reload with [[ivfLoad]]; query with
    * `ivfTopKIndexed(..., pruneCells = true)`.
    */
  def ivfPersist(index: IvfIndex, table: String): Unit = {
    val spark = index.assigned.sparkSession
    index.assigned.write.mode("overwrite")
      .partitionBy("__cell").format("parquet").saveAsTable(table)
    import org.apache.spark.sql.types._
    val rows = index.centroids.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq) }
    val schema = StructType(Seq(StructField("cell", IntegerType),
      StructField("centroid", ArrayType(DoubleType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), schema)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_centroids")
  }

  /** Reload a persisted IVF index: centroids re-collect driver-side
    * (bounded by nCentroids — model output, not data), the assigned corpus
    * is the partitioned table as written. No refit, no corpus re-scan. */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, table: String): IvfIndex = {
    val cents = spark.table(s"${table}_centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1).map(_._2)
    IvfIndex(cents, spark.table(table))
  }

  /** Assign NEW vectors to an existing index's cells — nearest centroid by
    * exact squared L2, centroids attached as a literal explode (the same
    * pure-Generate shape as the query probe; no join). The incremental
    * index-maintenance primitive: a growing corpus appends batches without
    * a refit, keeping the quantizer — and therefore every already-served
    * cell assignment — stable.
    */
  def ivfAssign(index: IvfIndex, newRows: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfAssignCells(index.centroids, newRows, idCol, vecCol)

  /** [[ivfAssign]] against bare centroids — shared by the flat and PQ
    * append paths (the PQ index carries no raw-vector frame to wrap). */
  def ivfAssignCells(centroids: Array[Array[Double]], newRows: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centLit = typedlit(centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq)
    newRows.select(col(idCol).as("cand_id"), col(vecCol).as("cv0"),
        explode(centLit).as("__c"))
      .withColumn("dist", aggregate(zip_with(col("cv0"), col("__c._2"),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (a, v) => a + v))
      .withColumn("rk", row_number().over(Window.partitionBy(col("cand_id"))
        .orderBy(col("dist").asc, col("__c._1").asc)))
      .filter(col("rk") === 1)
      .select(col("cand_id"), col("cv0"), col("__c._1").as("__cell"))
  }

  /** Append a batch to a [[ivfPersist]]ed index table: assign to the FIXED
    * cells, insert into the partitioned table (only the touched cells'
    * partitions receive files). Serving sessions pick the rows up on their
    * next `ivfLoad`/table read — no refit, no rewrite of existing data.
    */
  def ivfAppend(index: IvfIndex, newRows: DataFrame, table: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    ivfAssign(index, newRows, idCol, vecCol)
      .write.mode("append").format("parquet").insertInto(table)

  /** IVF query against a PREBUILT index — the serving shape. With
    * `pruneCells` the distinct probed cells (bounded by nCentroids; driver
    * action over the QUERY batch only, never the corpus) become a literal
    * `IN` filter on the cell column, so a [[ivfPersist]]ed index reads only
    * the probed partitions — the 100 TB serving plan.
    */
  def ivfTopKIndexed(index: IvfIndex, queries: DataFrame, k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      pruneCells: Boolean = false): DataFrame = {
    val assigned = index.assigned
    val centroids = index.centroids
    // nProbe nearest centroids per query: the centroids are driver-side
    // model output, so they attach as an exploded LITERAL array — a pure
    // Generate (fan-out nCentroids per query), no join in the plan at all
    // (a crossJoin against even a 16-row broadcast frame plans as a
    // BroadcastNestedLoopJoin and trips the plan-shape guard)
    val centLit = typedlit(centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv0"))
    val qCells = q.select(col("query_id"), col("qv0"), explode(centLit).as("__c"))
      .withColumn("__cell", col("__c._1"))
      .withColumn("cent", col("__c._2"))
      .withColumn("dist", aggregate(zip_with(col("qv0"), col("cent"),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)), lit(0.0), (a, v) => a + v))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist").asc, col("__cell").asc)))
      .filter(col("rk") <= nProbe)
      .select(col("query_id"), col("qv0"), col("__cell"))
    // pruning needs the probed-cell set driver-side AND the probe frame in
    // the join — checkpoint the (queries × nProbe)-row frame so the
    // explode+window probe computes ONCE per serving call, not twice
    val (probe, corpusSide) =
      if (!pruneCells) (qCells, assigned)
      else {
        val qc = qCells.localCheckpoint(true)
        // the probed-cell set is a tiny query-batch property (≤ nCentroids
        // values); collecting it buys partition pruning on the corpus scan
        val cells = qc.select(col("__cell")).distinct()
          .collect().map(_.getInt(0)).sorted
        (qc, assigned.filter(col("__cell").isin(cells.map(Int.box): _*)))
      }
    val cand = probe.join(corpusSide, Seq("__cell"))
      .filter(col("cand_id") =!= col("query_id"))
    val scored = cand
      .withColumn("qv", quantize(col("qv0"))).withColumn("cv", quantize(col("cv0")))
      .withColumn("sim", dotQ(col("qv"), col("cv")).cast("double") /
        (sqrt(dotQ(col("qv"), col("qv")).cast("double")) *
          sqrt(dotQ(col("cv"), col("cv")).cast("double"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Embedding near-dup pairs at scale: multi-table sign-LSH bucketing for
    * candidate generation (pairs sharing a bucket in ≥1 table — shuffle on
    * bucket keys, never all-pairs), then EXACT cosine verification of the
    * candidates only. This is the user-facing operator; [[cosineNearDupPairs]]
    * is its oracle in specs (≙ how MinHash-LSH is verified against the naive
    * Jaccard join).
    *
    * Recall is tuned by `nPlanes` × `tables` against the target threshold:
    * per-table collision probability for a pair at angle θ is
    * `(1 − θ/π)^nPlanes`. Defaults suit true near-dups (cosine ≥ 0.7); for
    * lower thresholds use fewer planes / more tables (each halving of
    * nPlanes squares-root the bucket selectivity).
    */
  def lshNearDupPairs(df: DataFrame, threshold: Double, dim: Int,
      nPlanes: Int = 8, tables: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigCols = (0 until tables).map(t =>
      signature(col(vecCol), hyperplanes(dim, nPlanes, t)).as(s"sig_$t"))
    // persisted: both sides of the bucket self-join read it
    val banded = df.select(col(idCol) +: sigCols: _*)
      .select(col(idCol), posexplode(
        array((0 until tables).map(t => col(s"sig_$t")): _*)).as(Seq("table", "sig")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // lean pair dedup on bare ids (map-side combine), not distinct() on rows
    val cand = banded.select(col(idCol).as("i"), col("table"), col("sig"))
      .join(banded.select(col(idCol).as("j"), col("table"), col("sig")), Seq("table", "sig"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("__nb")).drop("__nb")
    val vecs = df.select(col(idCol), quantize(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val result = cand
      .join(vecs.select(col(idCol).as("i"), col("v").as("vi")), Seq("i"))
      .join(vecs.select(col(idCol).as("j"), col("v").as("vj")), Seq("j"))
      .withColumn("sim", dotQ(col("vi"), col("vj")).cast("double") /
        (sqrt(dotQ(col("vi"), col("vi")).cast("double")) *
          sqrt(dotQ(col("vj"), col("vj")).cast("double"))))
      .filter(col("sim") >= threshold)
      .select(col("i"), col("j"), col("sim"))
    Lifecycle.materializeAndRelease(result, banded, vecs)
  }

  /** Training contract shared by [[ivfTopK]] and [[kmeansFit]]: fit on a
    * deterministic subset of at most `trainCap` vectors — centroid quality
    * needs only a representative sample, and a full-corpus fit would be the
    * one non-sublinear step at 100 TB. The cap probe is a
    * `limit(cap+1).count()` (stops scanning once the limit is hit) so a
    * within-cap corpus — the common case, unchanged results — never pays a
    * full scan. An over-cap corpus takes the trainCap SMALLEST id-hashes
    * (TakeOrdered: per-partition top-k, then a single bounded merge) — a
    * uniform, partitioning-independent pseudo-sample of exactly trainCap
    * rows in the one pass the fit reads anyway; no full count() action, no
    * fraction to derive.
    */
  private def trainSample(corpusVec: DataFrame, idCol: String, trainCap: Long): DataFrame = {
    val overCap = corpusVec.limit(math.min(trainCap + 1, Int.MaxValue.toLong).toInt)
      .count() > trainCap
    if (!overCap) corpusVec
    else corpusVec.withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h")).limit(trainCap.toInt).drop("__h")
  }

  /** Exact embedding near-dup pairs above a cosine threshold — the all-pairs
    * oracle baseline for [[lshNearDupPairs]] (oracle-checkable in DuckDB);
    * quadratic, never the user-facing operator at corpus scale.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("i"), quantize(col(vecCol)).as("vi"))
    val b = df.select(col(idCol).as("j"), quantize(col(vecCol)).as("vj"))
    a.crossJoin(b).filter(col("i") < col("j"))
      .withColumn("sim", dotQ(col("vi"), col("vj")).cast("double") /
        (sqrt(dotQ(col("vi"), col("vi")).cast("double")) *
          sqrt(dotQ(col("vj"), col("vj")).cast("double"))))
      .filter(col("sim") >= threshold)
      .select(col("i"), col("j"), col("sim"))
  }

  /** Semantic contamination pairs: corpus vectors within `threshold` cosine
    * of ANY eval-set vector — the embedding-space face of
    * [[graft.pipeline.TextDedup.decontaminate]]'s shingle overlap (catches
    * paraphrased eval leakage that exact n-gram matching misses; ≙ the
    * reference's exact-match-only containment checks, widened). Eval sets
    * are SMALL by nature (benchmarks are thousands of rows), so the eval
    * side broadcasts and the corpus side stays a pure scan — a broadcast
    * nested-loop at O(|corpus|·|eval|) integer dots with no corpus shuffle,
    * the right 100 TB shape as long as |eval| is index-free small (for a
    * large eval set, pre-bucket both sides with [[lshNearDupPairs]]'s
    * sign-LSH instead). Quantized-exact sims, engine-portable.
    */
  def semanticContaminationPairs(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val co = corpus.select(col(idCol).as("corpus_id"), quantize(col(vecCol)).as("cv"))
    val ev = evalSet.select(col(idCol).as("eval_id"), quantize(col(vecCol)).as("ev"))
    co.join(org.apache.spark.sql.functions.broadcast(ev))
      .withColumn("sim", cosineQ(col("cv"), col("ev")))
      .filter(col("sim") >= threshold)
      .select(col("corpus_id"), col("eval_id"), col("sim"))
  }

  /** Semantic decontamination: the corpus rows NOT near any eval vector.
    * The contaminated id set (bounded by the corpus rows that hit — in
    * practice eval-sized, not corpus-sized) comes back as a broadcastable
    * anti-join side, so the purge is scan + broadcast anti: the corpus is
    * read twice but never shuffled.
    */
  def decontaminateSemantic(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val bad = semanticContaminationPairs(corpus, evalSet, threshold, idCol, vecCol)
      .select(col("corpus_id")).distinct()
    // the hit set is bounded by construction (rows near a benchmark — the
    // same eval-scale contract as the broadcast eval shingle set in
    // TextDedup.decontaminate), so hint it broadcast: without the hint the
    // static plan sort-merge-joins, i.e. shuffles the 100 TB corpus on id
    corpus.join(org.apache.spark.sql.functions.broadcast(bad),
      corpus(idCol) === bad("corpus_id"), "left_anti")
  }

  // ---- Semantic clustering + SemDeDup ------------------------------------

  /** Driver-side mirror of [[quantize]]. Spark `round` is HALF_UP away from
    * zero — `math.round` differs on negative halves (≙ the Rules.scala:503
    * parity note), so quantize through BigDecimal like the column does.
    */
  private def quantizeDriver(v: Array[Double]): Array[Long] =
    v.map(x => BigDecimal(x * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)

  /** The embeddings of `ids`, in `ids` order, as centroid seeds — a bounded
    * k-row driver collect (same driver-size contract as [[ivfTopK]]'s model).
    */
  def centroidsFromIds(df: DataFrame, ids: Seq[Long],
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Array[Double]] = {
    val m = df.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    ids.map(id => m.getOrElse(id,
      throw new IllegalArgumentException(s"centroid seed id $id not found")))
  }

  /** Fit `k` cluster centroids (Lloyd's, fixed seed, ≤`trainCap`
    * deterministic sample — the [[trainSample]] training contract). Returns
    * driver-side centroids for [[kmeansAssign]] / [[semDedup]]; k is bounded
    * (centroids ride the plan as literals), the corpus is not.
    */
  def kmeansFit(df: DataFrame, k: Int, maxIter: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Long = 200_000L): Seq[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val corpusVec = df.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("__fv"))
    val km = new KMeans().setK(k).setSeed(42L).setMaxIter(maxIter)
      .setFeaturesCol("__fv").setPredictionCol("__cell")
    km.fit(trainSample(corpusVec, idCol, trainCap)).clusterCenters.map(_.toArray).toSeq
  }

  /** Nearest-centroid assignment by cosine. The centroids attach as plan
    * LITERALS — per row, k codegen'd integer dots and one `array_min` over
    * `(−sim, cluster)` structs — so the plan is a pure scan: no join, no
    * shuffle, no row fan-out; at 100 TB this costs one pass at k·dim
    * multiplies per row. Tie-break: lowest cluster index. Sims follow the
    * module's exact-quantized convention, so the assignment is bit-stable
    * across partitioning and engines (DuckDB oracle reproduces it). For k
    * beyond a few thousand, assign hierarchically (coarse cells first, e.g.
    * [[ivfTopK]]'s layout) instead of widening the literal array.
    */
  def kmeansAssign(df: DataFrame, centroids: Seq[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "kmeansAssign needs at least one centroid")
    val withV = df.withColumn("__qv", quantize(col(vecCol)))
    val entries = centroids.zipWithIndex.map { case (c, i) =>
      val cl = typedlit(quantizeDriver(c).toSeq)
      struct((-cosineQ(col("__qv"), cl)).as("negsim"), lit(i).as("cluster"))
    }
    withV.withColumn("__best", array_min(array(entries: _*)))
      .withColumn("cluster", col("__best").getField("cluster"))
      .withColumn("sim", -col("__best").getField("negsim"))
      .drop("__best", "__qv")
  }

  // ---- Product quantization (PQ) -----------------------------------------

  /** Split `codebooks` invariants: m subspace codebooks of equal-length
    * centroids whose lengths sum to the embedding dim.
    */
  private def pqCheck(codebooks: Seq[Seq[Array[Double]]]): Int = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty PQ codebooks")
    val sub = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == sub)),
      "PQ codebooks must hold equal-length subvector centroids")
    sub
  }

  /** PQ codebooks from seed ids: codebook `m` holds the seeds' `m`-th
    * subvector slices. Like [[centroidsFromIds]] — a deterministic,
    * oracle-reproducible seeding; [[pqFit]] is the trained production path.
    */
  def pqCodebooksFromIds(df: DataFrame, seedIds: Seq[Long], nSub: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Array[Double]]] = {
    val seeds = centroidsFromIds(df, seedIds, idCol, vecCol)
    val dim = seeds.head.length
    require(dim % nSub == 0, s"dim $dim not divisible into $nSub subspaces")
    val sub = dim / nSub
    (0 until nSub).map(m => seeds.map(v => v.slice(m * sub, (m + 1) * sub)))
  }

  /** Fit PQ codebooks: one independent KMeans per subspace over the sliced
    * vectors (fixed seed, [[trainSample]] contract — nSub bounded fits on a
    * bounded sample, never a full-corpus job per subspace).
    */
  def pqFit(df: DataFrame, nSub: Int, k: Int, maxIter: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Long = 200_000L): Seq[Seq[Array[Double]]] = {
    val dim = df.select(size(col(vecCol))).limit(1).collect().head.getInt(0)
    require(dim % nSub == 0, s"dim $dim not divisible into $nSub subspaces")
    val sub = dim / nSub
    (0 until nSub).map { m =>
      kmeansFit(df.select(col(idCol),
          slice(col(vecCol), m * sub + 1, sub).as(vecCol)),
        k, maxIter, idCol, vecCol, trainCap)
    }
  }

  /** PQ encoding: per subspace, the nearest codebook centroid by EXACT
    * integer L2² over quantized values (`d = x·x − 2x·c + c·c`, all integer
    * dots; ties break on the lower code). Codebooks ride the plan as
    * LITERALS, so this is a pure scan — no join, no shuffle — and the
    * emitted `codes` array (nSub small ints ≈ nSub bytes at k ≤ 256) is the
    * 100 TB memory story: a 64-dim float vector compresses 64× into codes
    * that downstream ADC scoring reads instead of the raw embedding.
    * Deterministic and engine-portable like every sim in this module.
    */
  def pqEncode(df: DataFrame, codebooks: Seq[Seq[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = pqCheck(codebooks)
    val withQ = df.withColumn("__qv", quantize(col(vecCol)))
    val codeCols = codebooks.zipWithIndex.map { case (cb, m) =>
      val xs = slice(col("__qv"), m * sub + 1, sub)
      // argmin of L2² = argmin of (c·c − 2x·c): the x·x term is constant
      // across codes, so it is dropped — one integer dot per code, and the
      // tie structure is unchanged (a constant shift)
      val entries = cb.zipWithIndex.map { case (c, k) =>
        val cq = quantizeDriver(c)
        val cLit = typedlit(cq.toSeq)
        val cc = cq.map(x => x * x).sum
        struct((lit(cc) - lit(2L) * dotQ(xs, cLit)).as("dist"), lit(k).as("code"))
      }
      array_min(array(entries: _*)).getField("code")
    }
    withQ.withColumn("codes", array(codeCols: _*)).drop("__qv")
  }

  /** IVF-PQ approximate top-k — the FAISS-style 100 TB ANN layout: an IVF
    * coarse quantizer ([[ivfTopK]]'s cell assignment) bounds WHICH rows each
    * query reads (nProbe/nCentroids of the corpus), and PQ codes bound HOW
    * MUCH each read costs (codes + literal lookup tables instead of raw
    * vectors; the fact side of the probe join carries `nSub` ints per row).
    * Scoring is asymmetric (ADC): exact query subvectors against the
    * candidates' reconstructed centroids —
    * `sim ≈ Σₘ qₘ·c[codeₘ] / (‖q‖·√Σₘ‖c[codeₘ]‖²)` — from exact integer
    * dots and integer norm lookups, so ranking is bit-stable. Recall tunes
    * via nProbe × codebook size; the exact re-rank of a PQ shortlist (fetch
    * raw vectors for the top-k′ only) is [[bruteForceTopK]] composed after.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      codebooks: Seq[Seq[Array[Double]]],
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Long = 200_000L): DataFrame =
    ivfPqTopKIndexed(ivfPqFit(corpus, codebooks, nCentroids, idCol, vecCol,
      trainCap), queries, k, nProbe, idCol, vecCol)

  /** A fitted IVF-PQ index: the coarse cell centroids and per-subspace PQ
    * codebooks (both driver-resident model output, bounded by
    * nCentroids / nSub·k) plus the CODED corpus (`cand_id, __cell, codes`)
    * — the 64×-compressed serving layout: nSub small ints per row instead
    * of the raw vector, fit ONCE offline, queried many times by ADC.
    * Persist with [[ivfPqPersist]] (codes land partitioned by cell, like
    * [[ivfPersist]]), reload with [[ivfPqLoad]], serve with
    * [[ivfPqTopKIndexed]]`(…, pruneCells = true)` so probes read only
    * nProbe/nCentroids of the coded corpus — and each row read is codes,
    * not floats.
    */
  final case class IvfPqIndex(centroids: Array[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]], coded: DataFrame)

  /** Fit the IVF-PQ layout: coarse cells via [[ivfFit]] (same quantizer,
    * seed, and sampling contract), then PQ-encode every assigned row — the
    * raw vector is dropped from the index; only (id, cell, codes) remain. */
  def ivfPqFit(corpus: DataFrame, codebooks: Seq[Seq[Array[Double]]],
      nCentroids: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Long = 200_000L): IvfPqIndex = {
    pqCheck(codebooks)
    val coarse = ivfFit(corpus, nCentroids, idCol, vecCol, trainCap)
    val coded = pqEncode(coarse.assigned, codebooks, "cand_id", "cv0")
      .select(col("cand_id"), col("__cell"), col("codes"))
    IvfPqIndex(coarse.centroids, codebooks, coded)
  }

  /** Persist a fitted IVF-PQ index: the coded corpus PARTITIONED BY cell id
    * (probed cells prune at the scan, and what the scan reads is the
    * nSub-int code column — both axes of the 100 TB serving cost bounded),
    * plus two tiny sidecars: `<table>_centroids` (as [[ivfPersist]]) and
    * `<table>_codebooks` (`m, code, centroid` rows, nSub·k of them). */
  def ivfPqPersist(index: IvfPqIndex, table: String): Unit = {
    val spark = index.coded.sparkSession
    index.coded.write.mode("overwrite")
      .partitionBy("__cell").format("parquet").saveAsTable(table)
    import org.apache.spark.sql.types._
    val centSchema = StructType(Seq(StructField("cell", IntegerType),
      StructField("centroid", ArrayType(DoubleType))))
    spark.createDataFrame(spark.sparkContext.parallelize(
        index.centroids.zipWithIndex
          .map { case (c, i) => org.apache.spark.sql.Row(i, c.toSeq) }.toList, 1),
        centSchema)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_centroids")
    val cbSchema = StructType(Seq(StructField("m", IntegerType),
      StructField("code", IntegerType),
      StructField("centroid", ArrayType(DoubleType))))
    val cbRows = for ((cb, m) <- index.codebooks.zipWithIndex.toList;
                      (c, k) <- cb.zipWithIndex)
      yield org.apache.spark.sql.Row(m, k, c.toSeq)
    spark.createDataFrame(spark.sparkContext.parallelize(cbRows, 1), cbSchema)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_codebooks")
  }

  /** Reload a persisted IVF-PQ index: both sidecars re-collect driver-side
    * (bounded model output), the coded corpus is the partitioned table as
    * written — no refit, no re-encode, no corpus scan. */
  def ivfPqLoad(spark: org.apache.spark.sql.SparkSession,
      table: String): IvfPqIndex = {
    val cents = spark.table(s"${table}_centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1).map(_._2)
    val codebooks = spark.table(s"${table}_codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    IvfPqIndex(cents, codebooks, spark.table(table))
  }

  /** Append a batch to a [[ivfPqPersist]]ed table: assign to the FIXED
    * cells, PQ-encode with the FIXED codebooks, insert into the partitioned
    * table — only the touched cells' partitions receive files; no refit,
    * no re-encode of existing rows (≙ [[ivfAppend]] for the coded layout).
    * Column order matches the table schema (partition col last). */
  def ivfPqAppend(index: IvfPqIndex, newRows: DataFrame, table: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    pqEncode(ivfAssignCells(index.centroids, newRows, idCol, vecCol),
        index.codebooks, "cand_id", "cv0")
      .select(col("cand_id"), col("codes"), col("__cell"))
      .write.mode("append").format("parquet").insertInto(table)

  /** IVF-PQ query against a PREBUILT coded index — the serving shape of
    * [[ivfPqTopK]] (identical probe, identical ADC arithmetic, so recall is
    * the same by construction). With `pruneCells` the distinct probed cells
    * (driver action over the QUERY batch only) become a literal `IN` filter
    * on the cell column, which a [[ivfPqPersist]]ed table turns into
    * PartitionFilters at the scan — read nProbe/nCentroids of the codes,
    * never the raw corpus. */
  def ivfPqTopKIndexed(index: IvfPqIndex, queries: DataFrame, k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      pruneCells: Boolean = false): DataFrame = {
    val codebooks = index.codebooks
    val sub = pqCheck(codebooks)
    // per-code literal lookup tables: quantized centroids and their norms²
    val cbLits = codebooks.map(cb => typedlit(cb.map(c => quantizeDriver(c).toSeq)))
    val nrmLits = codebooks.map(cb =>
      typedlit(cb.map(c => quantizeDriver(c).map(x => x * x).sum)))
    val centLit = typedlit(index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq)
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"),
      col(vecCol).as("qv0"))
    val qCells = q.select(col("query_id"), col("qv"), col("qv0"), explode(centLit).as("__c"))
      .withColumn("__cell", col("__c._1"))
      .withColumn("dist", aggregate(zip_with(col("qv0"), col("__c._2"),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)), lit(0.0), (a, v) => a + v))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist").asc, col("__cell").asc)))
      .filter(col("rk") <= nProbe)
      .select(col("query_id"), col("qv"), col("__cell"))
    // pruning needs the probed-cell set driver-side AND the probe frame in
    // the join — checkpoint so the explode+window probe computes once
    val (probe, corpusSide) =
      if (!pruneCells) (qCells, index.coded)
      else {
        val qc = qCells.localCheckpoint(true)
        val cells = qc.select(col("__cell")).distinct()
          .collect().map(_.getInt(0)).sorted
        (qc, index.coded.filter(col("__cell").isin(cells.map(Int.box): _*)))
      }
    // ADC: dot(q, recon) = Σₘ dotQ(q_sub, codebook[m][code]); ‖recon‖² via
    // the norm lookup — integer adds over literal tables, no raw vectors
    val adcDot = codebooks.indices.map { m =>
      dotQ(slice(col("qv"), m * sub + 1, sub),
        element_at(cbLits(m), col("codes").getItem(m) + 1))
    }.reduce(_ + _)
    val adcNorm2 = codebooks.indices.map { m =>
      element_at(nrmLits(m), col("codes").getItem(m) + 1)
    }.reduce(_ + _)
    val scored = probe.join(corpusSide, Seq("__cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("sim", adcDot.cast("double") /
        (sqrt(dotQ(col("qv"), col("qv")).cast("double")) * sqrt(adcNorm2.cast("double"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** IVF-PQ shortlist → EXACT re-rank — the full FAISS-style serving
    * composition the [[ivfPqTopK]] scaladoc promises: the PQ-coded probe
    * produces a k′-candidate shortlist per query (cheap, codes-only reads),
    * then raw vectors are fetched for the SHORTLIST ONLY and the final
    * top-k is exact cosine over them. Re-ranking repairs the ADC
    * quantization error at a cost of |queries|·k′ raw-vector reads — the
    * fetch joins the corpus scan against the BROADCAST shortlist (a few
    * thousand ids), so at 100 TB it is one map-side semi-join + scan, no
    * shuffle of the corpus. Recall@k is ≥ the plain IVF-PQ recall by
    * construction whenever k′ ≥ k (the reranked top-k is drawn from a
    * superset under the exact metric brute force uses).
    */
  def ivfPqRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int, kPrime: Int,
      codebooks: Seq[Seq[Array[Double]]],
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Long = 200_000L): DataFrame = {
    require(kPrime >= k, s"shortlist k'=$kPrime must be ≥ final k=$k")
    val shortlist = ivfPqTopK(corpus, queries, kPrime, codebooks,
        nCentroids, nProbe, idCol, vecCol, trainCap)
      .select(col("query_id"), col("cand_id"))
    val cRaw = corpus.select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("cv"))
    val qRaw = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    val scored = cRaw.join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(qRaw), Seq("query_id"))
      .withColumn("sim", cosineQ(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** SemDeDup (Abbas et al. 2023 shape): semantic near-dup removal scoped
    * WITHIN clusters — assign every vector to its nearest centroid
    * ([[kmeansAssign]], scan-shaped), then drop any vector with a LOWER-id
    * cluster-mate at cosine ≥ `threshold` (keep-first, ≙ the text-side
    * purge semantics). The pairwise step self-joins on the cluster key, so
    * the quadratic is bounded per cluster — size k to the corpus
    * (k ≈ N/10⁵ keeps cells web-scale-sized) and the shuffle carries the
    * cluster column only. Returns survivors with their `cluster` and
    * assignment `sim` attached.
    */
  def semDedup(df: DataFrame, centroids: Seq[Array[Double]], threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = kmeansAssign(df, centroids, idCol, vecCol)
    val slim = assigned.select(col("cluster"), col(idCol).as("__i"),
      quantize(col(vecCol)).as("__v"))
    val dropped = slim
      .join(slim.select(col("cluster"), col("__i").as("__j"), col("__v").as("__vj")),
        Seq("cluster"))
      .filter(col("__i") < col("__j"))
      .filter(cosineQ(col("__v"), col("__vj")) >= threshold)
      .select(col("__j").as(idCol)).distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
  }

  /** Prototype-based data pruning (Sorscher et al. 2022 shape): within each
    * cluster, rank vectors by prototypicality — cosine to the assigned
    * centroid, most prototypical first — and KEEP the least prototypical
    * `keepFrac` (hard examples carry more training signal than duplicates
    * of the cluster mode). One `row_number` + `count` window pair on the
    * cluster key: a single bounded shuffle after the scan-shaped
    * assignment. Ties break on id, so the kept set is deterministic.
    * Returns survivors with `cluster`, `sim`, and their prototypicality
    * `rank` (1 = most prototypical, pruned first).
    */
  def pruneByPrototypes(df: DataFrame, centroids: Seq[Array[Double]],
      keepFrac: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(keepFrac >= 0.0 && keepFrac <= 1.0, s"keepFrac $keepFrac outside [0,1]")
    val w = Window.partitionBy(col("cluster"))
    val assigned = kmeansAssign(df, centroids, idCol, vecCol)
      .withColumn("rank", row_number().over(
        w.orderBy(col("sim").desc, col(idCol).asc)))
      .withColumn("__n", count(lit(1)).over(w))
    assigned.filter(col("rank") > col("__n") - ceil(col("__n") * keepFrac))
      .drop("__n")
  }
}
