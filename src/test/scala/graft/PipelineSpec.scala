package graft

import graft.pipeline._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the approximate pipeline operators (the exact ones
  * are covered by the DuckDB oracle battery): recall of sign-LSH ANN vs the
  * brute-force baseline, completeness of SimHash banding, MinHash-LSH
  * equivalence to exact Jaccard at its operating threshold.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("minhash-LSH near-dup pairs equal exact Jaccard pairs at tau=0.9") {
    val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text", 64, 16, 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH pairs are exact-verified → never false positives")
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    assert(recall >= 0.999, s"recall $recall; expected ~1 at tau=0.9 with 16x4 bands")
  }

  test("NB classifier: separable corpus classifies perfectly, OOV falls back to priors, no UDF") {
    val s = spark
    import s.implicits._
    val train = Seq(
      (1L, "alpha alpha beta alpha", "x"), (2L, "alpha beta alpha", "x"),
      (3L, "alpha alpha gamma", "x"),
      (4L, "delta epsilon delta", "y"), (5L, "epsilon delta delta", "y"))
      .toDF("id", "t", "lab")
    val m = Classify.nbTrain(train, col("t"), col("lab"))
    assert(m.labels == Seq("x", "y") && m.vocabSize == 5)
    // held-out docs made of each class's tokens classify to that class
    val test = Seq((10L, "alpha beta"), (11L, "delta epsilon"),
      (12L, "zzz qqq")).toDF("id", "t")
    val pred = Classify.nbClassify(m, test, col("id"), col("t"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(pred(10L) == ("x", 2L) && pred(11L) == ("y", 2L))
    // all-OOV doc: scores are prior + n·ln(1/(T_l+V)); y's smaller token
    // mass (T_y=6 vs T_x=10) outweighs x's larger prior here —
    // ln(2/5)+2·ln(1/11) > ln(3/5)+2·ln(1/15)
    assert(pred(12L)._1 == "y")
    // the whole path is codegen'd columns — no UDF anywhere in the plan
    val plan = Classify.nbClassify(m, test, col("id"), col("t"))
      .queryExecution.executedPlan.treeString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }

  test("unigram LM: viterbi picks max-likelihood splits, training is lossless and monotone") {
    val s = spark
    import s.implicits._
    // hand-checkable viterbi: "abc" with p(ab)=0.4, p(c)=0.2, p(a)=p(b)=0.1,
    // p(abc) absent → [ab, c] (ln0.4+ln0.2 > ln0.1·3 and > any other split)
    val lp = Map("a" -> math.log(0.1), "b" -> math.log(0.1),
      "c" -> math.log(0.2), "ab" -> math.log(0.4))
    assert(TextAnalysis.viterbiSegment("abc", lp, 4) == List("ab", "c"))
    // unknown char surfaces as its own piece rather than failing the word
    assert(TextAnalysis.viterbiSegment("axb", lp, 4) == List("a", "x", "b"))

    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 2 == 0) "banana band banana" else "bandana banana ban"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.unigramTrain(corpus, "text",
      vocabSize = 12, maxPieceLen = 4, seedSize = 100, emIters = 3)
    assert(m.pieces.size <= 12 && m.pieces.keys.exists(_.length > 1))
    assert(Set("a", "b", "d", "n").subsetOf(m.pieces.keySet))
    // "an" (or a superstring) dominates this corpus; seed top must be the
    // weighted most frequent 2..4-gram, which is "an" here
    assert(m.seedTop._1 == "an" && m.seedTop._2 > 0)
    assert(m.llTrace.size == 3 && m.llTrace.sliding(2).forall {
      case Seq(x, y) => y >= x; case _ => true
    }, s"viterbi-EM likelihood must be monotone: ${m.llTrace}")
    val enc = TextAnalysis.unigramEncode(corpus, m)
      .join(corpus, Seq("doc_id"))
      .select(col("doc_id"), concat_ws("", col("tokens")).as("r"),
        regexp_replace(col("text"), " ", "").as("e"))
      .collect()
    assert(enc.length == 40 && enc.forall(r => r.getString(1) == r.getString(2)),
      "segmentation must concatenate back to the input")
  }

  test("NB scan serving: agrees with the join shape, plans as a pure scan") {
    val d = docs
    val m = Classify.nbTrain(d, col("text"), col("lang"))
    val joinShape = Classify.nbClassify(m, d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val scan = Classify.nbClassifyScan(m, d, col("doc_id"), col("text"))
    val scanShape = scan.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(scanShape == joinShape, "two serving shapes, one answer")
    val plan = scan.queryExecution.executedPlan.treeString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"scan serving must not join or shuffle:\n$plan")
    // cap guard: a tiny cap rejects the scan shape loudly
    val err = intercept[IllegalArgumentException] {
      Classify.nbClassifyScan(m, d, col("doc_id"), col("text"), vocabCap = 1)
    }
    assert(err.getMessage.contains("use nbClassify"))
  }

  test("NB merge: shard-trained models merge to the union model exactly") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "alpha alpha beta", "x"), (2L, "beta gamma", "x"),
      (3L, "delta delta epsilon", "y"), (4L, "epsilon zeta", "y"),
      (5L, "alpha zeta zeta", "x"))
      .toDF("id", "t", "lab")
    val whole = Classify.nbTrain(corpus, col("t"), col("lab"))
    val merged = Classify.nbMerge(
      Classify.nbTrain(corpus.filter(col("id") <= 2), col("t"), col("lab")),
      Classify.nbTrain(corpus.filter(col("id") > 2), col("t"), col("lab")))
    assert(merged.labels == whole.labels)
    assert(merged.vocabSize == whole.vocabSize)
    assert(merged.logPriors == whole.logPriors) // exact: same integer ratios
    assert(merged.oovLogp == whole.oovLogp)
    val w = whole.tokenLogp.collect().map(r => r.getString(0) ->
      (1 until r.length).map(r.getDouble)).toMap
    val m = merged.tokenLogp.collect().map(r => r.getString(0) ->
      (1 until r.length).map(r.getDouble)).toMap
    assert(m == w, "per-token log-likelihoods must be bit-identical")
  }

  test("viterbi property: equals brute-force best segmentation on random vocabularies") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abc"
    def bruteBest(w: String, lp: Map[String, Double], maxLen: Int): Option[Double] = {
      // enumerate all 2^(n-1) split masks; None if no segmentation exists
      val n = w.length
      (0 until (1 << (n - 1))).flatMap { mask =>
        val cuts = 0 +: (1 until n).filter(i => (mask & (1 << (i - 1))) != 0) :+ n
        val pieces = cuts.sliding(2).map { case Seq(a, b) => w.substring(a, b) }.toSeq
        if (pieces.forall(p => p.length <= maxLen &&
            (lp.contains(p) || p.length == 1)))
          Some(pieces.map(p => lp.getOrElse(p, -1e9)).sum)
        else None
      }.sortBy(-_).headOption
    }
    (1 to 60).foreach { _ =>
      val vocabMulti = Seq.fill(5)(
        (1 to (2 + rnd.nextInt(2))).map(_ => alphabet(rnd.nextInt(3))).mkString)
      val vocab = (alphabet.map(_.toString).filter(_ => rnd.nextBoolean()) ++ vocabMulti)
        .distinct.map(s => s -> math.log(0.05 + rnd.nextDouble())).toMap
      val w = (1 to (3 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(3))).mkString
      val got = TextAnalysis.viterbiSegment(w, vocab, 4)
      assert(got.mkString("") == w, s"lossless: $got vs $w")
      val gotLl = got.map(p => vocab.getOrElse(p, -1e9)).sum
      val best = bruteBest(w, vocab, 4).get
      assert(math.abs(gotLl - best) < 1e-9,
        s"viterbi $gotLl != brute $best for '$w' over ${vocab.keys}")
    }
  }

  test("curation lineage: accounts for every doc, sums to the curated output") {
    val d = docs
    val evalDf = d.filter(col("doc_id") % 97 === 0)
    val rates = Map("en" -> 2.0, "fr" -> 0.75)
    val lin = Curation.curateLineage(d, "doc_id", "text", evalDf, "text",
      qualityFloor = 0.6, stratumCol = col("lang"), rates = rates,
      defaultRate = 0.25, salt = "s42")
    assert(lin.count() == d.count(), "every input doc gets a disposition")
    val byDisp = lin.groupBy("disposition")
      .agg(count(lit(1)).as("n"), sum(col("copies")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // only kept docs carry copies, and they carry at least one each
    byDisp.foreach { case (disp, (n, c)) =>
      if (disp == "kept") assert(c >= n) else assert(c == 0, s"$disp carries copies") }
    // the audit's surviving-copy total IS the curated output's row count
    val curated = Curation.curateCorpus(d, "doc_id", "text", evalDf, "text",
      qualityFloor = 0.6, stratumCol = col("lang"), rates = rates,
      defaultRate = 0.25, salt = "s42").count()
    val totalCopies = lin.agg(sum(col("copies"))).collect()(0).getLong(0)
    assert(totalCopies == curated,
      s"lineage copies $totalCopies != curated rows $curated")
  }

  test("prefix-filtered jaccard equals driver-side brute force") {
    val sets = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      inter = sets(i).intersect(sets(j)).size
      sim = inter.toDouble / (sets(i).size + sets(j).size - inter) if sim >= 0.9
    } yield (i, j)).toSet
    val got = TextDedup.jaccardPairs(docs, "doc_id", "text", 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, "prefix filtering must be result-identical to brute force")
  }

  test("MinHashSketch aggregate equals driver-side per-slot min across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, xxhash64}
    val k = 16
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).flatMap(id =>
      Seq.fill(5 + rnd.nextInt(20))((id, s"w${rnd.nextInt(200)}")))
    // many partitions → partial buffers MUST merge (and serialize) correctly
    val df = rows.toDF("id", "w").repartition(8)
    val got = df.groupBy(col("id"))
      .agg(graft.functions.MinHashSketch(xxhash64(col("w")), k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val seeds = graft.functions.MinHashSketch.seedsFor(k)
    val wordHash = rows.map(_._2).distinct.toDF("w")
      .withColumn("h", xxhash64(col("w"))).as[(String, Long)].collect().toMap
    rows.map(_._1).distinct.foreach { id =>
      val hs = rows.filter(_._1 == id).map(r => wordHash(r._2))
      val expected = seeds.map(s => hs.map(h => graft.functions.MinHashSketch.mix(h ^ s)).min).toSeq
      assert(got(id) == expected, s"doc $id")
    }
  }

  test("prefix filtering: hot tokens generate no candidate explosion") {
    import spark.implicits._
    // every doc shares the hot token "the" but is otherwise disjoint — the
    // naive token self-join would emit 60·59/2 = 1770 candidate pairs
    val df = (0L until 60L)
      .map(i => (i, ("the" +: (0 until 9).map(j => s"tok_${i}_$j")).mkString(" ")))
      .toDF("doc_id", "text")
    val cand = TextDedup.jaccardCandidates(
      TextDedup.wordRel(df, "doc_id", "text"), "doc_id", 0.9)
    assert(cand.count() == 0, "hot token must never enter a prefix")
    assert(TextDedup.jaccardPairs(df, "doc_id", "text", 0.9).count() == 0)
  }

  test("simhash banding is complete for hamming <= 3 (pigeonhole)") {
    val sh = TextDedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = sh.keys.toSeq.sorted
    val expected = (for {
      i <- all; j <- all if i < j
      h = java.lang.Long.bitCount(sh(i) ^ sh(j)) if h <= 3
    } yield (i, j)).toSet
    val got = TextDedup.simhashPairs(docs, "doc_id", "text", 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, "banded candidate generation must be lossless up to distance 3")
  }

  test("LSH embedding near-dup: no false positives, recall >= 0.95 vs exact") {
    val exact = Similarity.cosineNearDupPairs(emb, 0.45)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(emb, 0.45, dim = 64, nPlanes = 4, tables = 24)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "candidates are exact-verified → never false positives")
    val recall = if (exact.isEmpty) 1.0 else lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall with 24 tables x 4 planes at cos >= 0.45")
  }

  test("sign-LSH ANN: useful recall at a fraction of the comparisons") {
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, 10, dim = 64)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.25, s"recall@10 = $recall — uniform-random vectors are LSH-hostile, " +
      "but the bucketed path must still find a usable fraction")
  }

  test("IVF ANN: probing a fraction of cells still finds most true neighbors") {
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nCentroids = 16, nProbe = 6)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@10 = $recall with 6/16 cells probed")
  }

  test("IVF index: fit once, query many — indexed results identical, no refit per batch") {
    val idx = Similarity.ivfFit(emb, nCentroids = 16)
    idx.assigned.persist()
    try {
      val q1 = emb.filter(col("vec_id") < 10)
      val direct = Similarity.ivfTopK(emb, q1, 10, nCentroids = 16, nProbe = 6)
        .select("query_id", "cand_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val indexed = Similarity.ivfTopKIndexed(idx, q1, 10, nProbe = 6)
        .select("query_id", "cand_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(indexed == direct, "indexed path must reproduce the fit+query path exactly")
      // a second query batch against the SAME index — the serving pattern
      val q2 = emb.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      val b2 = Similarity.ivfTopKIndexed(idx, q2, 10, nProbe = 6).collect()
      assert(b2.nonEmpty && b2.forall(_.getLong(0) >= 10))
    } finally { idx.assigned.unpersist(); () }
  }

  test("heavy hitters: SpaceSaving bounds hold across partitions; small corpora exact") {
    val s = spark
    import s.implicits._
    // skewed synthetic stream over MANY partitions: zipf-ish head + a long
    // uniform tail far wider than the sketch, so eviction and merging are
    // both exercised
    val head = (0 until 8).flatMap(i => Seq.fill((8 - i) * 1000)(s"h$i"))
    val tail = (0 until 20000).map(i => s"t${i % 5000}")
    val stream = s.sparkContext.parallelize(
      scala.util.Random.shuffle(head ++ tail).toList, 16).toDF("text")
    val hh = TextAnalysis.heavyHitters(stream, "text", capacity = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.length <= 64)
    val trueCounts = (head ++ tail).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every tracked token obeys cnt >= true >= cnt - err
    hh.foreach { case (t, c, e) =>
      val tc = trueCounts(t)
      assert(c >= tc && tc >= c - e, s"bounds violated for $t: cnt=$c err=$e true=$tc")
    }
    // the guarantee: every token with true freq > n/capacity is tracked
    val n = (head ++ tail).size
    val guaranteed = trueCounts.filter(_._2 > n.toLong / 64).keySet
    assert(guaranteed.subsetOf(hh.map(_._1).toSet),
      s"missing guaranteed heavy hitters: ${guaranteed -- hh.map(_._1).toSet}")
    // a corpus with fewer distinct tokens than capacity is EXACT
    val small = TextAnalysis.heavyHitters(docs, "text", capacity = 4096)
    val exact = docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    if (exact.count() <= 4096) {
      val a = small.select("token", "cnt").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val b = exact.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(a == b, "sub-capacity sketch must be exact")
      assert(small.collect().forall(_.getLong(2) == 0L), "sub-capacity err must be 0")
    }
    // plan shape: one ObjectHashAggregate pipeline, no vocabulary-wide shuffle
    val plan = TextAnalysis.heavyHitters(stream, "text", 64)
      .queryExecution.executedPlan.treeString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$plan")
  }

  test("stratified heavy hitters: every rollup grain keeps the SpaceSaving contract") {
    val s = spark
    import s.implicits._
    val rows = (0 until 4).flatMap { lang =>
      val head = (0 until 4).flatMap(i => Seq.fill((5 - i) * 200)(s"L${lang}h$i"))
      val tail = (0 until 3000).map(i => s"L${lang}t${i % 800}")
      (head ++ tail).map(w => (s"lang$lang", w))
    }
    val df = s.sparkContext.parallelize(scala.util.Random.shuffle(rows).toList, 16)
      .toDF("lang", "text")
    val hhFull = TextAnalysis.heavyHittersByStratum(df, "lang", "text", capacity = 64)
    val hh = hhFull.select("stratum", "token", "cnt", "err")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val strata = hh.map(_._1).toSet
    assert(strata == Set("lang0", "lang1", "lang2", "lang3", "<ALL>"))
    // the grouping bit rides along: exactly the total rows carry is_total=1,
    // so a real stratum literally named "<ALL>" would stay distinguishable
    val totalFlags = hhFull.select("stratum", "is_total").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(totalFlags == strata.map(st => (st, if (st == "<ALL>") 1 else 0)))
    // per-grain bounds + containment, INCLUDING the merged total row
    val byStratum = rows.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap +
      ("<ALL>" -> rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
    byStratum.foreach { case (stratum, trueCounts) =>
      val mine = hh.filter(_._1 == stratum)
      assert(mine.length <= 64, s"$stratum over capacity")
      mine.foreach { case (_, t, c, e) =>
        val tc = trueCounts(t)
        assert(c >= tc && tc >= c - e, s"$stratum/$t: cnt=$c err=$e true=$tc")
      }
      val n = trueCounts.values.sum
      val guaranteed = trueCounts.filter(_._2 > n / 64).keySet
      assert(guaranteed.subsetOf(mine.map(_._2).toSet),
        s"$stratum missing guaranteed: ${guaranteed -- mine.map(_._2).toSet}")
    }
    // ONE aggregation pass: a single pair of ObjectHashAggregates (partial +
    // final) over the Expand, not one job per stratum
    val plan = TextAnalysis.heavyHittersByStratum(df, "lang", "text", 64)
      .queryExecution.executedPlan.treeString
    assert(plan.contains("Expand"), s"rollup Expand expected:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2,
      s"expected exactly partial+final sketch aggregates:\n$plan")
  }

  test("IVF index persists partitioned by cell; pruned serving scans only probed cells") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS ivf_idx_spec")
    s.sql("DROP TABLE IF EXISTS ivf_idx_spec_centroids")
    val idx = Similarity.ivfFit(emb, nCentroids = 16)
    Similarity.ivfPersist(idx, "ivf_idx_spec")
    val loaded = Similarity.ivfLoad(s, "ivf_idx_spec")
    assert(loaded.centroids.length == 16)
    assert(loaded.centroids.toSeq.map(_.toSeq) == idx.centroids.toSeq.map(_.toSeq))
    val q = emb.filter(col("vec_id") < 10)
    def keySet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val base = keySet(Similarity.ivfTopKIndexed(idx, q, 10, nProbe = 6))
    val pruned = Similarity.ivfTopKIndexed(loaded, q, 10, nProbe = 6,
      pruneCells = true)
    assert(keySet(pruned) == base,
      "the persisted+pruned serving path must reproduce the in-session index exactly")
    // the probed-cell IN list must land as a PARTITION filter on the scan —
    // the whole point of the partitioned layout at 100 TB
    val plan = pruned.queryExecution.executedPlan.treeString
    assert("PartitionFilters: \\[[^\\]]*__cell".r.findFirstIn(plan).isDefined,
      s"expected a __cell partition filter on the index scan:\n$plan")
  }

  test("IVF-PQ index persists coded + partitioned; pruned ADC serving matches in-session") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS ivfpq_idx_spec")
    s.sql("DROP TABLE IF EXISTS ivfpq_idx_spec_centroids")
    s.sql("DROP TABLE IF EXISTS ivfpq_idx_spec_codebooks")
    val cb = Similarity.pqFit(emb, nSub = 8, k = 16)
    val idx = Similarity.ivfPqFit(emb, cb, nCentroids = 16)
    Similarity.ivfPqPersist(idx, "ivfpq_idx_spec")
    val loaded = Similarity.ivfPqLoad(s, "ivfpq_idx_spec")
    assert(loaded.centroids.toSeq.map(_.toSeq) == idx.centroids.toSeq.map(_.toSeq))
    assert(loaded.codebooks.map(_.map(_.toSeq)) == cb.map(_.map(_.toSeq)),
      "codebook sidecar must round-trip in (m, code) order")
    // the persisted table carries codes, never raw vectors — the 64×
    // compression story is the schema, not a comment
    assert(!loaded.coded.columns.contains("cv0") &&
      loaded.coded.columns.toSet == Set("cand_id", "codes", "__cell"))
    val q = emb.filter(col("vec_id") < 10)
    def keySet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val base = keySet(Similarity.ivfPqTopKIndexed(idx, q, 10, nProbe = 6))
    val pruned = Similarity.ivfPqTopKIndexed(loaded, q, 10, nProbe = 6,
      pruneCells = true)
    assert(keySet(pruned) == base,
      "the persisted+pruned ADC path must reproduce the in-session index exactly")
    // the composed convenience path is the same fit+serve: identical ranks
    assert(keySet(Similarity.ivfPqTopK(emb, q, 10, cb, nProbe = 6)) == base)
    val plan = pruned.queryExecution.executedPlan.treeString
    assert("PartitionFilters: \\[[^\\]]*__cell".r.findFirstIn(plan).isDefined,
      s"expected a __cell partition filter on the coded-index scan:\n$plan")
  }

  test("IVF-PQ append: new vectors join the persisted coded index without refit or re-encode") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS ivfpq_app_spec")
    s.sql("DROP TABLE IF EXISTS ivfpq_app_spec_centroids")
    s.sql("DROP TABLE IF EXISTS ivfpq_app_spec_codebooks")
    val first = emb.filter(col("vec_id") < 50)
    val rest = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
    val cb = Similarity.pqFit(first, nSub = 8, k = 16)
    val idx = Similarity.ivfPqFit(first, cb, nCentroids = 16)
    Similarity.ivfPqPersist(idx, "ivfpq_app_spec")
    Similarity.ivfPqAppend(idx, rest, "ivfpq_app_spec")
    val loaded = Similarity.ivfPqLoad(s, "ivfpq_app_spec")
    assert(loaded.coded.count() == first.count() + rest.count())
    // appended rows carry the FIXED quantizer's cell and the FIXED
    // codebooks' codes: identical to what a full refit-free fit over the
    // grown corpus would encode for those ids
    val direct = Similarity.ivfPqFit(first, cb, nCentroids = 16) // same seed
    val expect = graft.pipeline.Similarity
      .ivfAssignCells(direct.centroids, rest)
    val gotCells = loaded.coded.filter(col("cand_id") >= 50)
      .select("cand_id", "__cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val expCells = expect.select(col("cand_id"), col("__cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(gotCells == expCells, "append must use the fixed quantizer's cells")
    // served through the persisted table, appended vectors are findable:
    // probing every cell makes IVF-PQ exhaustive over the codes
    val q = emb.filter(col("vec_id") === 55)
    val got = Similarity.ivfPqTopKIndexed(loaded, q, 5, nProbe = 16,
        pruneCells = true)
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got.forall(id => id < 60),
      "served candidates must come from the grown corpus")
  }

  test("IVF append: new vectors join the persisted index without refit") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS ivf_app_spec")
    s.sql("DROP TABLE IF EXISTS ivf_app_spec_centroids")
    val first = emb.filter(col("vec_id") < 50)
    val rest = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
    val idx = Similarity.ivfFit(first, nCentroids = 16)
    Similarity.ivfPersist(idx, "ivf_app_spec")
    Similarity.ivfAppend(idx, rest, "ivf_app_spec")
    val loaded = Similarity.ivfLoad(s, "ivf_app_spec")
    assert(loaded.assigned.count() == first.count() + rest.count())
    // appended rows carry the FIXED quantizer's assignment (same argmin as
    // the fit-time transform — centroids unchanged by append)
    val q = emb.filter(col("vec_id") === 55)
    // probing every cell makes IVF exhaustive: results must equal brute
    // force over the grown corpus, proving appended vectors are served
    val ivfAll = Similarity.ivfTopKIndexed(loaded, q, 5, nProbe = 16,
        pruneCells = true)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(first.union(rest), q, 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfAll == brute,
      "all-cells IVF over the appended index must equal brute force over the grown corpus")
    assert(brute.nonEmpty)
  }

  test("IVF ANN over-cap trains on a bounded hash-ordered sample, same recall floor") {
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // trainCap far below the corpus size forces the over-cap branch: fit on
    // the trainCap smallest id-hashes (uniform pseudo-sample, no full count)
    val ivf = Similarity.ivfTopK(emb, queries, 10, nCentroids = 16, nProbe = 6,
      trainCap = 64L)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"over-cap IVF recall@10 = $recall (64-vector train sample)")
  }

  test("multimodal BMP/WAV decode from actual bytes (hand-built files)") {
    import spark.implicits._
    def le32(v: Int): Seq[Byte] =
      Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def le16(v: Int): Seq[Byte] = Seq(v, v >> 8).map(x => (x & 0xff).toByte)
    // minimal 54-byte BMP header: "BM", file size, reserved, pixel offset,
    // BITMAPINFOHEADER(40), width=17, height=-9 (top-down → reported as 9)
    val bmp: Array[Byte] = (
      "BM".getBytes("US-ASCII").toSeq ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(17) ++ le32(-9) ++ le16(1) ++ le16(24) ++
      Seq.fill(24)(0.toByte)).toArray
    // minimal WAV: RIFF/WAVE, fmt chunk (PCM, 2ch, 8000 Hz, 16-bit),
    // data chunk DECLARING 3.5 s of payload (truncated body — headers rule)
    val dataBytes = (3.5 * 8000 * 2 * 2).toInt
    val wav: Array[Byte] = (
      "RIFF".getBytes("US-ASCII").toSeq ++ le32(36 + dataBytes) ++
      "WAVE".getBytes("US-ASCII").toSeq ++
      "fmt ".getBytes("US-ASCII").toSeq ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000) ++ le32(8000 * 2 * 2) ++ le16(4) ++ le16(16) ++
      "data".getBytes("US-ASCII").toSeq ++ le32(dataBytes)).toArray
    val in = Seq(
      Multimodal.Asset(1L, "image", bmp),
      Multimodal.Asset(2L, "audio", wav),
      Multimodal.Asset(3L, "image", "plain text, not a bitmap".getBytes("UTF-8")))
      .toDS()
    val out = Multimodal.decode(in).collect().map(d => d.doc_id -> d).toMap
    // BMP: real dimensions from the header bytes, single frame, 24 bpp → 3ch
    assert(out(1L).width == 17 && out(1L).height == 9 && out(1L).n_frames == 1)
    assert(out(1L).channels == 3, "24-bit BMP reports 3 channels")
    // WAV: rate/channels/whole-second duration (ceil 3.5 → 4)
    assert(out(2L).width == 8000 && out(2L).height == 2 && out(2L).n_frames == 4)
    assert(out(2L).channels == 2)
    // non-media payload falls back to the deterministic stub (n = 24 bytes)
    assert(out(3L).width == 24 % 640 + 1 && out(3L).n_frames == 24 % 7 + 1)
    assert(out(3L).channels == 0, "stubbed payloads report channels = 0")
  }

  test("multimodal PNG/JPEG decode via javax.imageio: real dims and band counts") {
    import spark.implicits._
    val in = Seq(
      Multimodal.Asset(1L, "image", Multimodal.syntheticImage("png", 23, 11, gray = false)),
      Multimodal.Asset(2L, "image", Multimodal.syntheticImage("png", 5, 7, gray = true)),
      Multimodal.Asset(3L, "image", Multimodal.syntheticImage("jpg", 40, 3, gray = false)),
      Multimodal.Asset(4L, "image", Multimodal.syntheticImage("jpg", 8, 19, gray = true)),
      // PNG bytes but DECLARED video: modality gate must stub it
      Multimodal.Asset(5L, "video", Multimodal.syntheticImage("png", 23, 11, gray = false)),
      // truncated PNG: magic sniffs but the decode fails → stub, no error
      Multimodal.Asset(6L, "image",
        Multimodal.syntheticImage("png", 23, 11, gray = false).take(20)),
      // GIFs read back palette-indexed: 1 raster band whatever the fill
      Multimodal.Asset(7L, "image", Multimodal.syntheticImage("gif", 17, 9, gray = false)),
      Multimodal.Asset(8L, "image", Multimodal.syntheticImage("gif", 4, 6, gray = true)))
      .toDS()
    val out = Multimodal.decode(in).collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).width == 23 && out(1L).height == 11 &&
      out(1L).channels == 3 && out(1L).n_frames == 1, s"RGB PNG: ${out(1L)}")
    assert(out(2L).width == 5 && out(2L).height == 7 && out(2L).channels == 1,
      s"gray PNG decodes 1 band: ${out(2L)}")
    assert(out(3L).width == 40 && out(3L).height == 3 && out(3L).channels == 3,
      s"RGB JPEG: ${out(3L)}")
    assert(out(4L).width == 8 && out(4L).height == 19 && out(4L).channels == 1,
      s"gray JPEG decodes 1 band: ${out(4L)}")
    val n5 = out(5L).n_bytes
    assert(out(5L).width == n5 % 640 + 1 && out(5L).channels == 0,
      s"video-declared PNG must stub: ${out(5L)}")
    assert(out(6L).width == 20 % 640 + 1 && out(6L).channels == 0,
      s"truncated PNG must fall through to the stub, not error: ${out(6L)}")
    assert(out(7L).width == 17 && out(7L).height == 9 && out(7L).channels == 1,
      s"RGB-filled GIF decodes palette-indexed (1 band): ${out(7L)}")
    assert(out(8L).width == 4 && out(8L).height == 6 && out(8L).channels == 1,
      s"gray GIF decodes 1 band: ${out(8L)}")
  }

  test("multimodal decode is gated on the declared modality; hostile WAV sizes stub") {
    import spark.implicits._
    def le32(v: Int): Seq[Byte] =
      Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def le16(v: Int): Seq[Byte] = Seq(v, v >> 8).map(x => (x & 0xff).toByte)
    val bmp: Array[Byte] = (
      "BM".getBytes("US-ASCII").toSeq ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(17) ++ le32(-9) ++ le16(1) ++ le16(24) ++
      Seq.fill(24)(0.toByte)).toArray
    // valid-looking WAV but rate=1/ch=1/bits=8 (bytesPerSec=1) and a u32-max
    // data size: computed duration ≈ 4.29e9 s would wrap a naive .toInt —
    // the >24h plausibility cut must route it to the stub instead
    val hostileWav: Array[Byte] = (
      "RIFF".getBytes("US-ASCII").toSeq ++ le32(36) ++
      "WAVE".getBytes("US-ASCII").toSeq ++
      "fmt ".getBytes("US-ASCII").toSeq ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(1) ++ le32(1) ++ le16(1) ++ le16(8) ++
      "data".getBytes("US-ASCII").toSeq ++ le32(-1)).toArray
    val in = Seq(
      // BMP bytes, but DECLARED video: must not get image-shaped metadata
      Multimodal.Asset(1L, "video", bmp),
      Multimodal.Asset(2L, "audio", hostileWav),
      // real BMP under the right modality still decodes
      Multimodal.Asset(3L, "image", bmp)).toDS()
    val out = Multimodal.decode(in).collect().map(d => d.doc_id -> d).toMap
    val stubOf = (n: Int) => (n % 640 + 1, (n * 7) % 480 + 1, n % 7 + 1)
    val (w1, h1, f1) = stubOf(bmp.length)
    assert(out(1L).width == w1 && out(1L).height == h1 && out(1L).n_frames == f1,
      s"video-declared BMP must stub, got ${out(1L)}")
    val (w2, h2, f2) = stubOf(hostileWav.length)
    assert(out(2L).n_frames == f2 && out(2L).width == w2 && out(2L).height == h2,
      s"hostile WAV duration must stub (never a negative n_frames), got ${out(2L)}")
    assert(out(2L).n_frames > 0)
    assert(out(3L).width == 17 && out(3L).height == 9 && out(3L).n_frames == 1)
  }

  test("multimodal WebP/FLAC/MP4 container metadata: real parses, bounds, gating") {
    import spark.implicits._
    val in = Seq(
      // WebP lossless (VP8L word) with and without the alpha bit
      Multimodal.Asset(1L, "image", Multimodal.syntheticWebP(300, 17, alpha = false, extended = false)),
      Multimodal.Asset(2L, "image", Multimodal.syntheticWebP(9, 4000, alpha = true, extended = false)),
      // WebP extended (VP8X canvas) — the 24-bit minus-one fields
      Multimodal.Asset(3L, "image", Multimodal.syntheticWebP(1920, 1080, alpha = true, extended = true)),
      Multimodal.Asset(4L, "image", Multimodal.syntheticWebP(1, 1, alpha = false, extended = true)),
      // FLAC: exact whole-second duration, then a ceil case (rate·2 + 1 samples → 3 s)
      Multimodal.Asset(5L, "audio", Multimodal.syntheticFlac(44100, 2, 44100L * 7)),
      Multimodal.Asset(6L, "audio", Multimodal.syntheticFlac(16000, 1, 16000L * 2 + 1)),
      // MP4: dims + ceil(duration/timescale) (1500 ms → 2 s)
      Multimodal.Asset(7L, "video", Multimodal.syntheticMp4(640, 360, 90000L)),
      Multimodal.Asset(8L, "video", Multimodal.syntheticMp4(1280, 720, 1500L)),
      // modality gate: FLAC bytes declared image must stub, WebP declared video too
      Multimodal.Asset(9L, "image", Multimodal.syntheticFlac(44100, 2, 44100L)),
      Multimodal.Asset(10L, "video", Multimodal.syntheticWebP(300, 17, alpha = false, extended = false)),
      // truncated payloads: magic sniffs but the walk runs out → stub, no error
      Multimodal.Asset(11L, "image", Multimodal.syntheticWebP(300, 17, alpha = false, extended = false).take(14)),
      Multimodal.Asset(12L, "audio", Multimodal.syntheticFlac(44100, 2, 44100L).take(10)),
      Multimodal.Asset(13L, "video", Multimodal.syntheticMp4(640, 360, 90000L).take(30)),
      // AVI avih main header: dims + 25fps frame-count duration
      Multimodal.Asset(14L, "video", Multimodal.syntheticAvi(720, 480, 12)),
      Multimodal.Asset(15L, "video", Multimodal.syntheticAvi(720, 480, 12).take(28))).toDS()
    val out = Multimodal.decode(in).collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).width == 300 && out(1L).height == 17 && out(1L).channels == 3 &&
      out(1L).n_frames == 1, s"VP8L no-alpha: ${out(1L)}")
    assert(out(2L).width == 9 && out(2L).height == 4000 && out(2L).channels == 4,
      s"VP8L alpha bit → 4 channels: ${out(2L)}")
    assert(out(3L).width == 1920 && out(3L).height == 1080 && out(3L).channels == 4,
      s"VP8X canvas + alpha flag: ${out(3L)}")
    assert(out(4L).width == 1 && out(4L).height == 1 && out(4L).channels == 3,
      s"VP8X 1×1 minus-one fields: ${out(4L)}")
    assert(out(5L).width == 44100 && out(5L).height == 2 && out(5L).n_frames == 7 &&
      out(5L).channels == 2, s"FLAC STREAMINFO: ${out(5L)}")
    assert(out(6L).width == 16000 && out(6L).height == 1 && out(6L).n_frames == 3,
      s"FLAC duration rounds up: ${out(6L)}")
    assert(out(7L).width == 640 && out(7L).height == 360 && out(7L).n_frames == 90 &&
      out(7L).channels == 0, s"MP4 mvhd/tkhd: ${out(7L)}")
    assert(out(8L).width == 1280 && out(8L).height == 720 && out(8L).n_frames == 2,
      s"MP4 duration rounds up: ${out(8L)}")
    assert(out(14L).width == 720 && out(14L).height == 480 && out(14L).n_frames == 12 &&
      out(14L).channels == 0, s"AVI avih: ${out(14L)}")
    val stubOf = (n: Int) => (n % 640 + 1, (n * 7) % 480 + 1, n % 7 + 1)
    Seq(9L, 10L, 11L, 12L, 13L, 15L).foreach { id =>
      val (w, h, f) = stubOf(out(id).n_bytes)
      assert(out(id).width == w && out(id).height == h && out(id).n_frames == f &&
        out(id).channels == 0, s"asset $id must stub: ${out(id)}")
    }
  }

  test("multimodal lossy-VP8 header parse: sync code, 14-bit dims") {
    import spark.implicits._
    // no VP8 lossy ENCODER here (that genuinely needs libwebp) — the parser
    // is exercised on a hand-assembled bitstream header per the spec:
    // 3-byte frame tag, 9D 01 2A sync, 14-bit LE width/height
    def le16b(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, (v >> 8 & 0xff).toByte)
    val payload: Array[Byte] =
      (Seq[Byte](0x10, 0x02, 0x00, 0x9d.toByte, 0x01, 0x2a) ++
        le16b(407) ++ le16b(233) ++ Seq.fill(8)(0.toByte)).toArray
    val riff = {
      val bos = new java.io.ByteArrayOutputStream()
      def w32le(v: Int): Unit = { bos.write(v & 0xff); bos.write(v >>> 8 & 0xff)
        bos.write(v >>> 16 & 0xff); bos.write(v >>> 24 & 0xff) }
      bos.write("RIFF".getBytes("US-ASCII")); w32le(4 + 8 + payload.length)
      bos.write("WEBP".getBytes("US-ASCII"))
      bos.write("VP8 ".getBytes("US-ASCII")); w32le(payload.length)
      bos.write(payload); bos.toByteArray
    }
    // corrupt sync code (payload byte 3, absolute offset 12 + 8 + 3)
    val bad = riff.clone(); bad(23) = 0x00
    val in = Seq(Multimodal.Asset(1L, "image", riff),
      Multimodal.Asset(2L, "image", bad)).toDS()
    val out = Multimodal.decode(in).collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).width == 407 && out(1L).height == 233 &&
      out(1L).channels == 3 && out(1L).n_frames == 1, s"lossy VP8: ${out(1L)}")
    assert(out(2L).channels == 0 && out(2L).width == bad.length % 640 + 1,
      s"corrupt sync must stub: ${out(2L)}")
  }

  test("multimodal parser fuzz: truncation/corruption never errors — parses or stubs") {
    import spark.implicits._
    // seeded fuzz over every synthetic fixture: random truncation, random
    // byte flips, both — the container walks must neither throw nor emit
    // implausible metadata, whatever the bytes (the 100 TB contract: one
    // hostile payload can never fail a decode task)
    val rnd = new scala.util.Random(421)
    val fixtures: Seq[Array[Byte]] = Seq(
      Multimodal.syntheticWebP(300, 17, alpha = true, extended = false),
      Multimodal.syntheticWebP(1920, 1080, alpha = false, extended = true),
      Multimodal.syntheticFlac(44100, 2, 44100L * 3),
      Multimodal.syntheticOgg(opus = true, 16000, 2, 5),
      Multimodal.syntheticOgg(opus = false, 44100, 1, 2),
      Multimodal.syntheticMkv(1280, 720, 9),
      Multimodal.syntheticMp4(640, 360, 5000L),
      Multimodal.syntheticAvi(720, 480, 9),
      Multimodal.syntheticImage("png", 23, 11, gray = false),
      Multimodal.syntheticImage("jpg", 8, 19, gray = true),
      Multimodal.syntheticImage("gif", 17, 9, gray = false))
    val mods = Array("image", "audio", "video")
    val assets = scala.collection.mutable.ArrayBuffer[Multimodal.Asset]()
    var id = 0L
    fixtures.foreach { fx =>
      (0 until 40).foreach { _ =>
        val mutated: Array[Byte] = rnd.nextInt(3) match {
          case 0 => fx.take(rnd.nextInt(fx.length + 1))
          case 1 =>
            val b = fx.clone(); b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte; b
          case _ =>
            val t = fx.take(rnd.nextInt(fx.length + 1))
            if (t.nonEmpty) t(rnd.nextInt(t.length)) = rnd.nextInt(256).toByte
            t
        }
        assets += Multimodal.Asset(id, mods(rnd.nextInt(3)), mutated)
        id += 1
      }
    }
    (0 until 60).foreach { _ => // pure garbage of random length
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b)
      assets += Multimodal.Asset(id, mods(rnd.nextInt(3)), b); id += 1
    }
    val out = Multimodal.decode(assets.toSeq.toDS()).collect()
    assert(out.length == assets.length)
    out.foreach { d =>
      assert(d.width >= 1 && d.height >= 1 && d.n_frames >= 1 &&
        d.channels >= 0 && d.channels <= 16, s"implausible metadata: $d")
    }
  }

  test("multimodal decode plumbing: schema, determinism, frame fan-out") {
    val decoded = Multimodal.decode(Multimodal.assets(docs)).collect()
    assert(decoded.length == docs.count())
    decoded.foreach { d =>
      assert(Set("image", "audio", "video").contains(d.modality))
      assert(d.n_frames >= 1 && d.n_frames <= 7)
      assert(d.width >= 1 && d.height >= 1)
    }
    // deterministic: same input → same checksum on re-run
    val again = Multimodal.decode(Multimodal.assets(docs)).collect()
    assert(decoded.map(_.checksum).sorted.sameElements(again.map(_.checksum).sorted))
    val frames = Multimodal.sampleFrames(Multimodal.decode(Multimodal.assets(docs)))
    assert(frames.groupBy("doc_id").count().collect().forall(_.getLong(1) >= 1))
  }

  test("repetition signals: hand-computed fractions, short-doc guards, flag") {
    import spark.implicits._
    def sig(text: String): (Double, Double, Double, Boolean) = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val cols = TextAnalysis.repetitionSignals(col("text")).map { case (n, c) => c.as(n) }
      val r = df.select(cols :+ TextAnalysis.repetitiveFlag(col("text")).as("rep"): _*).head
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3))
    }
    // "a a a": words 3 distinct 1 → 2/3; bigrams ("a a","a a") → 1/2;
    // trigram single → 0
    val (dw, db, dt, rep) = sig("a a a")
    assert(dw == 1.0 - 1.0 / 3 && db == 0.5 && dt == 0.0 && rep)
    // all-distinct doc: every fraction 0, flag false
    assert(sig("the quick brown fox") == ((0.0, 0.0, 0.0, false)))
    // repeated bigram across distinct positions: "x y x y x" bigrams
    // (xy, yx, xy, yx) → 2 distinct of 4 → 0.5; trigrams (xyx, yxy, xyx)
    // → 2 of 3 → 1/3
    val (dw2, db2, dt2, _) = sig("x y x y x")
    assert(dw2 == 1.0 - 2.0 / 5 && db2 == 0.5 && dt2 == 1.0 - 2.0 / 3)
    // single word: n-gram guards yield 0, never a descending-sequence value
    assert(sig("solo") == ((0.0, 0.0, 0.0, false)))
    // the bigram signal separates docs the word signal can't: both have
    // dup_word 1/2, but "a b a b" repeats the (a,b) bigram and "a b b a"
    // repeats none
    val (w3, b3, _, _) = sig("a b a b")
    val (w4, b4, _, _) = sig("a b b a")
    assert(w3 == w4 && b3 == 1.0 - 2.0 / 3 && b4 == 0.0)
  }

  test("packSequences: concat-and-cut offsets, stratum isolation, collision guard") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", 300L), (2L, "en", 300L), (3L, "en", 300L),
      (4L, "de", 600L), (5L, "de", 100L)).toDF("doc_id", "lang", "tok")
    val out = Curation.packSequences(df, col("doc_id"), col("lang"), col("tok"), 512)
      .select("doc_id", "pack_id", "start_in_pack").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // en stream: starts 0, 300, 600 → packs 0, 0, 1; offsets 0, 300, 88
    assert(out(1L) == ((0L, 0L)) && out(2L) == ((0L, 300L)) && out(3L) == ((1L, 88L)))
    // de stream packs independently: starts 0, 600
    assert(out(4L) == ((0L, 0L)) && out(5L) == ((1L, 88L)))
    // output-column collision is rejected loudly
    intercept[IllegalArgumentException](
      Curation.packSequences(df.withColumnRenamed("tok", "pack_id"),
        col("doc_id"), col("lang"), col("pack_id"), 512))
    intercept[IllegalArgumentException](
      Curation.packSequences(df, col("doc_id"), col("lang"), col("tok"), 0))
    // partitioning-independent: the window orders by id within stratum, so
    // any input partitioning yields the identical packing
    val repart = Curation.packSequences(df.repartition(7), col("doc_id"),
      col("lang"), col("tok"), 512)
      .select("doc_id", "pack_id", "start_in_pack").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(repart == out)
  }

  test("packSequencesBucketed: per-bucket offsets, bucket-unique ids, tail bound") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, "en", 100L)).toDF("doc_id", "lang", "tok")
    val nBuckets = 4
    val rows = Curation.packSequencesBucketed(
      df, col("doc_id"), col("lang"), col("tok"), 512, nBuckets)
      .select("doc_id", "bucket", "n_tokens", "pack_id", "start_in_pack").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // per-bucket offset correctness: within each (bucket), the exclusive
    // prefix sum of tokens in doc_id order must reproduce pack/offset —
    // checked against an independent driver-side computation
    rows.groupBy(_._2).foreach { case (b, rs) =>
      var start = 0L
      rs.sortBy(_._1).foreach { case (id, _, n, packId, inPack) =>
        assert(packId == (b.toLong << 40) + start / 512,
          s"doc $id bucket $b: pack_id mismatch")
        assert(inPack == start % 512, s"doc $id bucket $b: offset mismatch")
        start += n
      }
    }
    // the bucket in the high bits makes pack ids disjoint across buckets
    val byBucket = rows.groupBy(_._2).view.mapValues(_.map(_._4).toSet).toMap
    for (a <- byBucket.keys; b <- byBucket.keys if a < b)
      assert(byBucket(a).intersect(byBucket(b)).isEmpty)
    assert(rows.map(_._4 >> 40).toSet == rows.map(_._2.toLong).toSet) // decode

    // ≤ 1 partial tail pack per bucket vs plain packSequences: total packs
    // grow by at most (nBuckets − 1) extra partial tails
    def nPacks(ps: Iterable[Long]) = ps.toSet.size
    val plain = Curation.packSequences(df, col("doc_id"), col("lang"), col("tok"), 512)
      .select("pack_id").collect().map(_.getLong(0))
    assert(nPacks(rows.map(_._4).toSeq) <= nPacks(plain.toSeq) + (nBuckets - 1))

    // partition-independence: identical layout at any input partitioning
    val repart = Curation.packSequencesBucketed(
      df.repartition(13), col("doc_id"), col("lang"), col("tok"), 512, nBuckets)
      .select("doc_id", "pack_id", "start_in_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(repart == rows.map(r => (r._1, r._4, r._5)).toSet)
  }

  test("chunkDocuments boundaries: clamp, exact multiple, overlap 0, single word") {
    import spark.implicits._
    def mk(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    def chunksOf(text: String, size: Int, overlap: Int): Seq[(Int, String, Int)] = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      TextAnalysis.chunkDocuments(df, col("text"), size, overlap)
        .select("chunk_id", "chunk_text", "chunk_tokens").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    }
    // doc shorter than chunkSize: exactly one clamped chunk
    assert(chunksOf(mk(3), 5, 2) == Seq((0, "w1 w2 w3", 3)))
    // single word
    assert(chunksOf("solo", 5, 2) == Seq((0, "solo", 1)))
    // overlap 0, exact multiple: clean tiling, concatenation reconstructs
    val flat = chunksOf(mk(10), 5, 0)
    assert(flat == Seq((0, "w1 w2 w3 w4 w5", 5), (1, "w6 w7 w8 w9 w10", 5)))
    assert(flat.map(_._2).mkString(" ") == mk(10))
    // overlap 2, len 11 = exact tiling end: final chunk is full-size
    val tiled = chunksOf(mk(11), 5, 2)
    assert(tiled.map(_._1) == Seq(0, 1, 2))
    assert(tiled.last == ((2, "w7 w8 w9 w10 w11", 5)))
    // overlap 2, len 12: final chunk clamps to the remaining 3 words and the
    // tiling still reaches the last word
    val clamped = chunksOf(mk(12), 5, 2)
    assert(clamped.map(_._3) == Seq(5, 5, 5, 3))
    assert(clamped.last._2 == "w10 w11 w12")
    // neighbors share exactly `overlap` words
    clamped.sliding(2).foreach { case Seq((_, a, _), (_, b, _)) =>
      assert(a.split(" ").takeRight(2).sameElements(b.split(" ").take(2)))
    case _ => }
    // invalid parameters are rejected loudly
    intercept[IllegalArgumentException](chunksOf(mk(5), 3, 3))
  }

  test("language id returns a code for every document") {
    val got = docs.select(TextAnalysis.langId(col("text")).as("l")).collect().map(_.getString(0))
    assert(got.forall(l => Set("en", "de", "fr", "es", "zh", "und").contains(l)))
  }

  test("decontaminate drops docs sharing >= minHits distinct shingles with the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // contains 2 eval shingles
      (2L, "quick brown fox at rest"),                       // 1 shingle ("quick brown fox")
      (3L, "completely unrelated text about spark engines"), // 0
      (4L, "quick brown fox jumps high today")               // "quick brown fox"+"brown fox jumps" = 2
    ).toDF("doc_id", "text")
    val eval = Seq("a quick brown fox jumps away").toDF("text")
    val out2 = TextDedup.decontaminate(corpus, "doc_id", "text", eval, "text",
      shingle = 3, minHits = 2).select("doc_id").as[Long].collect().toSet
    assert(out2 == Set(2L, 3L)) // 1 and 4 share >= 2 shingles → purged
    val out1 = TextDedup.decontaminate(corpus, "doc_id", "text", eval, "text",
      shingle = 3, minHits = 1).select("doc_id").as[Long].collect().toSet
    assert(out1 == Set(3L))     // at minHits=1 even one shared shingle purges
    // empty eval set → corpus unchanged
    val none = TextDedup.decontaminate(corpus, "doc_id", "text",
      eval.filter(col("text") === "nope"), "text", 3, 1).count()
    assert(none == 4)
  }

  test("shingles never alias across word boundaries (separator regression pin)") {
    import spark.implicits._
    // 'ab c d' and 'a bc d' concatenate identically — only the 
    // separator keeps their 3-shingles distinct. If someone "simplifies"
    // the separator away, this purges doc 1 spuriously and fails.
    val corpus = Seq((1L, "ab c d")).toDF("doc_id", "text")
    val eval = Seq("a bc d").toDF("text")
    val out = TextDedup.decontaminate(corpus, "doc_id", "text", eval, "text",
      shingle = 3, minHits = 1)
    assert(out.count() == 1, "cross-boundary shingle alias: separator lost")
  }

  test("scrubPii redacts emails and phone runs, leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "mail me at jane.doe+x@sub.example.org please",
      "call 555-123-4567 or 555-0123-4567 now",
      "nothing sensitive here").toDF("text")
      .select(TextAnalysis.scrubPii(col("text")).as("s")).as[String].collect()
    assert(rows(0) == "mail me at <EMAIL> please")
    assert(rows(1) == "call <PHONE> or <PHONE> now")
    assert(rows(2) == "nothing sensitive here")
  }

  test("winnowing fingerprints: subset-of-grams, overlap guarantee, edges") {
    import spark.implicits._
    def fps(texts: Seq[String], k: Int = 3, w: Int = 4): Seq[Seq[Long]] =
      texts.zipWithIndex.map(_.swap).toDF("id", "text")
        .orderBy("id")
        .select(TextAnalysis.winnowingFingerprints(col("text"), k, w))
        .as[Seq[Long]].collect().toSeq
    val doc = "a b c d e f g h i j k l m n o p"
    val Seq(f1) = fps(Seq(doc))
    // selected fingerprints are a subset of the gram hash set
    val grams = spark.range(1).toDF
      .select(transform(
        sequence(lit(1), lit(doc.split(" ").length - 2)),
        i => conv(substring(md5(array_join(
          slice(split(lit(doc), " "), i, lit(3)), "")), 1, 8), 16, 10)
          .cast("long")).as("g")).as[Seq[Long]].head()
    assert(f1.nonEmpty && f1.toSet.subsetOf(grams.toSet))
    assert(f1 == f1.sorted && f1.distinct == f1)
    // identical docs -> identical prints; the winnowing guarantee: a shared
    // run of >= w+k-1 = 6 words shares >= 1 fingerprint even with different
    // surroundings
    val Seq(fa, fb) = fps(Seq(
      "x1 x2 " + doc,                      // doc embedded after a prefix
      doc + " y1 y2"))                     // doc with a suffix
    assert(fa.toSet.intersect(fb.toSet).nonEmpty)
    // edges: shorter than k -> empty; exactly k words -> single gram kept
    assert(fps(Seq("one two")) == Seq(Seq.empty))
    val Seq(single) = fps(Seq("one two three"))
    assert(single.length == 1)
    // unrelated vocab -> disjoint prints (no spurious collisions at 32 bits)
    val Seq(fc, fd) = fps(Seq(doc, "q r s t u v w x y z aa bb"))
    assert(fc.toSet.intersect(fd.toSet).isEmpty)
  }

  test("winnowingFingerprintRel (staged) is value-identical to the Column form") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq((90001L, "one two"), (90002L, "one two three"))
        .toDF("doc_id", "text")) // sub-k and exactly-k edges ride along
    val viaColumn = d.select(col("doc_id"),
      explode(TextAnalysis.winnowingFingerprints(col("text"), 3, 4)).as("fp"))
      .as[(Long, Long)].collect().toSet
    val viaRel = TextAnalysis.winnowingFingerprintRel(d, "doc_id", "text", 3, 4)
      .as[(Long, Long)].collect().toSet
    assert(viaRel == viaColumn,
      "the staged corpus pass must select the exact same fingerprints")
  }

  test("winnowPairs detects containment; posting cap drops boilerplate") {
    import spark.implicits._
    val shared = "s1 s2 s3 s4 s5 s6" // >= w+k-1 = 6 words: guaranteed hit
    val docs = Seq(
      (1L, "h1 h2 h3 h4 " + shared + " h5 h6 h7 h8 h9 h10"), // host
      (2L, shared),                                          // contained doc
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val pairs = TextDedup.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(pairs.head._3 >= 1)
    // a fingerprint present in EVERY doc is boilerplate: with the cap below
    // its df it contributes no pairs
    val boiler = Seq(
      (1L, shared), (2L, shared), (3L, shared)).toDF("doc_id", "text")
    assert(TextDedup.winnowPairs(boiler, "doc_id", "text",
      k = 3, w = 4, minShared = 1, maxPostings = 2).count() == 0)
  }

  test("corpusReport: hand-computed rollup cells, subtotals, grand total") {
    import spark.implicits._
    val docs = Seq(
      ("en", "web", "the fast cat."),   // 3 tokens, 13 chars, 2 stop, 1 punct
      ("en", "web", "of mice"),         // 2 tokens,  7 chars, 1 stop, 0 punct
      ("en", "books", "in in in"),      // 3 tokens,  8 chars, 1 stop (distinct), 0
      ("de", "web", "der hund!"))       // 2 tokens,  9 chars, 0 stop ('en' list), 0
      .toDF("lang", "source", "text")
    val out = TextAnalysis.corpusReport(docs, "lang", "source", "text")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out((Some("en"), Some("web"))) == (2L, 5L, 20L, 3L, 1L))
    assert(out((Some("en"), Some("books"))) == (1L, 3L, 8L, 1L, 0L))
    assert(out((Some("de"), Some("web"))) == (1L, 2L, 9L, 0L, 1L))
    assert(out((Some("en"), None)) == (3L, 8L, 28L, 4L, 1L))
    assert(out((Some("de"), None)) == (1L, 2L, 9L, 0L, 1L))
    assert(out((None, None)) == (4L, 10L, 37L, 4L, 2L))
  }

  test("dedupExactPriority keeps the best-priority row per group, id tie-break") {
    import spark.implicits._
    val df = Seq(
      // group "a b": priorities 2,1,1 → keeper id 20 (prio 1, lowest id)
      (10L, "a b", 2, "crawl"),
      (20L, "b a", 1, "mirror"),
      (30L, "a a b", 1, "mirror2"),
      // group "c": single row survives untouched
      (40L, "c", 3, "solo"))
      .toDF("doc_id", "text", "prio", "source")
    val out = TextDedup.dedupExactPriority(df, "doc_id",
      TextDedup.wordSetFingerprint(col("text")), col("prio"),
      carryCols = Seq("source"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(out == Set((20L, 1, "mirror", 3L), (40L, 3, "solo", 1L)))
    // min-id keep rule of exactDedup is the priority-0 special case
    val flat = TextDedup.dedupExactPriority(df, "doc_id",
      TextDedup.wordSetFingerprint(col("text")), lit(0))
      .select("doc_id").as[Long].collect().toSet
    assert(flat == Set(10L, 40L))
  }

  test("gopher signals: hand-computed values and drop-flag bounds") {
    import spark.implicits._
    val df = Seq(
      // 12 words, all alpha, 4 distinct stopwords (the/and/to/fast), top
      // word 'the' x2 -> keep
      (1L, "the fast cat and the dog ran over a hill to rest"),
      // keyword stuffing: top_word_frac 10/12 -> dropped
      (2L, "buy buy buy buy buy buy buy buy buy buy the of"),
      // too short -> dropped
      (3L, "the of tiny"),
      // numbers are not alpha words: alpha_word_frac 8/12 < 0.8 -> dropped
      (4L, "the fast dog and 1 2 3 4 cat ran far away"))
      .toDF("doc_id", "text")
    val sig = TextAnalysis.gopherSignals(col("text"))
    val out = df.select((col("doc_id") +: sig.map { case (n, c) => c.as(n) }) :+
      TextAnalysis.gopherDropFlag(col("text")).as("dropped"): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4), r.getDouble(5),
          r.getBoolean(6))).toMap
    val (n1, mwl1, af1, sh1, twf1, d1) = out(1L)
    assert(n1 == 12 && af1 == 1.0 && sh1 == 4 && !d1)
    assert(math.abs(mwl1 - (48 - 11) / 12.0) < 1e-12) // 48 chars incl. 11 spaces
    assert(math.abs(twf1 - 2 / 12.0) < 1e-12)
    assert(out(2L)._6 && math.abs(out(2L)._5 - 10 / 12.0) < 1e-12) // stuffing
    assert(out(3L)._6)                                             // length floor
    assert(out(4L)._6 && math.abs(out(4L)._3 - 8 / 12.0) < 1e-12)  // alpha floor
  }
}
