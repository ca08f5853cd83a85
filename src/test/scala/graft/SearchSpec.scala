package graft

import graft.pipeline.Search
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lexical retrieval: BM25 ranking semantics, direct-vs-indexed parity, and
  * TF-IDF keyword selection.
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "rare rare common filler filler filler"),
      (4L, "filler filler filler filler filler filler"),
      (5L, "common common common filler filler filler")
    ).toDF("doc_id", "text")
  }

  test("hybrid RRF: fusion order, one-list docs, symmetric-rank tie-break") {
    val s = spark
    import s.implicits._
    // lex: docs 1..4 ranked 1..4; sem: docs 3,1,9 ranked 1..3
    val lex = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("doc_id", "rank")
    val sem = Seq((3L, 1), (1L, 2), (9L, 3)).toDF("doc_id", "rank")
    val r = Search.hybridRrfTopK(lex, sem, 10, rrfK = 60).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((Option(x.getAs[java.lang.Long]("rank_lex")).map(_.toLong),
          Option(x.getAs[java.lang.Long]("rank_sem")).map(_.toLong),
          x.getAs[Long]("rrf_rank"))))
    val byDoc = r.toMap
    // scores: d1 = 1/61+1/62, d3 = 1/63+1/61, d2 = 1/62, d9 = 1/63, d4 = 1/64
    // d1 > d3 (1/61+1/62 > 1/61+1/63); then d2 (lex-only rank 2) beats
    // d9 (sem-only rank 3) beats d4 (lex-only rank 4)
    assert(r.map(_._1).toSeq == Seq(1L, 3L, 2L, 9L, 4L))
    assert(byDoc(1L) == ((Some(1L), Some(2L), 1L)))
    assert(byDoc(9L) == ((None, Some(3L), 4L))) // absent from lex: null rank
    // symmetric ranks = exact score tie → doc_id breaks it deterministically
    val lex2 = Seq((7L, 5)).toDF("doc_id", "rank")
    val sem2 = Seq((2L, 5)).toDF("doc_id", "rank")
    val t = Search.hybridRrfTopK(lex2, sem2, 10).collect().map(_.getAs[Long]("doc_id"))
    assert(t.toSeq == Seq(2L, 7L))
  }

  test("bm25: rare-term evidence dominates; more tf of it ranks higher") {
    val r = Search.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq("rare", "common"), 5).collect()
    // docs without any query term are absent
    assert(!r.map(_.getAs[Long]("doc_id")).contains(4L))
    val byRank = r.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    // doc 3 (rare×2) over doc 1 (rare×1) over the common-only docs;
    // doc 5 (common×3) over doc 2 (common×1)
    assert(byRank.take(2) == Seq(3L, 1L))
    assert(byRank.indexOf(5L) < byRank.indexOf(2L))
  }

  test("bm25: equal-statistics docs tie-break by doc_id") {
    val s = spark
    import s.implicits._
    val dup = Seq((7L, "x y"), (3L, "x y"), (5L, "x y")).toDF("doc_id", "text")
    val r = Search.bm25TopK(dup, col("doc_id"), col("text"), Seq("x"), 3)
      .collect().sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    assert(r == Seq(3L, 5L, 7L))
  }

  test("bm25: direct and prebuilt-index paths agree on the documents table") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val q = Seq("dup", "merge", "scan")
    val direct = Search.bm25TopK(docs, col("doc_id"), col("text"), q, 10)
    val p = Search.postings(docs, col("doc_id"), col("text"))
    val dl = Search.docLengths(docs, col("doc_id"), col("text"))
    val indexed = Search.bm25TopKIndexed(p, dl, q, 10)
    val a = direct.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dl"),
      r.getAs[Long]("tf_total"), r.getAs[Int]("rank"))).sortBy(_._4).toSeq
    val b = indexed.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dl"),
      r.getAs[Long]("tf_total"), r.getAs[Int]("rank"))).sortBy(_._4).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("persisted index: a query's term filter bucket-prunes the posting scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Search.buildIndex(docs, col("doc_id"), col("text"), "srch_post", "srch_len", 16)
    val q = Seq("dup", "merge", "scan")
    // serving-session conf (see buildIndex scaladoc): keep the bucketed scan
    // so its term-filter bucket pruning survives the planner
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val served = Search.bm25TopKIndexed(spark.table("srch_post"), spark.table("srch_len"), q, 10)
      val scan = served.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).find(_.contains("srch_post"))
        .getOrElse(fail("no posting scan in plan"))
      val sel = "SelectedBucketsCount: (\\d+) out of 16".r.findFirstMatchIn(scan)
        .getOrElse(fail(s"posting scan not bucket-pruned: $scan")).group(1).toInt
      assert(sel <= q.size) // at most one bucket per query term
      // and the served results equal the direct corpus-scan path
      val direct = Search.bm25TopK(docs, col("doc_id"), col("text"), q, 10)
      assert(served.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
        direct.collect().map(_.toSeq).toSeq.sortBy(_.toString))
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }

  test("tfidf: a term in every document scores zero and loses to any rarer term") {
    val r = Search.tfidfKeywords(corpus, col("doc_id"), col("text"), 1)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("term")).toMap
    // "filler" is in all 5 docs -> idf = ln(1) = 0; rarer terms win wherever present
    assert(r(1L) == "common" || r(1L) == "rare")
    assert(r(3L) == "rare")
    assert(r(5L) == "common")
    // doc 4 has only "filler": rank-1 keyword is still emitted (score 0)
    assert(r(4L) == "filler")
  }

  test("tfidf: df statistics come from the full corpus even for a reported slice") {
    val all = Search.tfidfKeywords(corpus, col("doc_id"), col("text"), 2)
      .filter(col("doc_id") === 3L)
    val sliced = Search.tfidfKeywords(corpus, col("doc_id"), col("text"), 2,
      keepDocs = col("doc_id") === 3L)
    val a = all.collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
      r.getAs[Int]("rank"))).sortBy(_._3).toSeq
    val b = sliced.collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
      r.getAs[Int]("rank"))).sortBy(_._3).toSeq
    assert(a == b)
  }

  test("bm25Score: frozen-stats column reproduces bm25TopK's ranking") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val q = Seq("dup", "merge", "scan")
    val st = Search.corpusStats(docs, col("doc_id"), col("text"), q)
    val viaColumn = docs
      .select(col("doc_id"), Search.bm25Score(col("text"), q, st).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val viaTopK = Search.bm25TopK(docs, col("doc_id"), col("text"), q, 10)
      .collect().sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    assert(viaColumn == viaTopK)
  }

  test("bm25Score: stateless scoring runs unchanged on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val q = Seq("rare", "common")
    // stats frozen OFFLINE from the batch corpus — the serving snapshot
    val st = Search.corpusStats(corpus, col("doc_id"), col("text"), q)
    val mem = MemoryStream[(Long, String)]
    val scoredStream = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), Search.bm25Score(col("text"), q, st).as("score"))
    val sq = scoredStream.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("bm25_stream").start()
    val batchRows = corpus.select("doc_id", "text").as[(Long, String)].collect()
    mem.addData(batchRows.toIndexedSeq: _*)
    sq.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM bm25_stream").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    sq.stop()
    // identical doubles to the batch twin, doc for doc
    val batch = corpus.select(col("doc_id"), Search.bm25Score(col("text"), q, st).as("score"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(streamed == batch)
    assert(batch.values.exists(_ > 0))
  }

  test("tokens: lowercases and drops empties") {
    val s = spark
    import s.implicits._
    val r = Seq("A  b C ").toDF("t")
      .select(Search.tokens(col("t")).as("w")).head.getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("vocabCoverage: rank, cumulative and total counts match driver math") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val words = docs.select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    val counts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ordered = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val cum = ordered.scanLeft(0L)(_ + _._2).tail
    val expected = ordered.take(10).zipWithIndex.map { case ((t, c), i) =>
      (t, c, (i + 1).toLong, cum(i), words.length.toLong)
    }.toSet
    val got = Search.vocabCoverage(docs, col("text"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong,
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("tfidf/vocab run no stray driver actions (r9 advice: fold the extra passes)") {
    // building the frames must launch ZERO jobs — N / total ride the single
    // evaluation as broadcast one-row aggregates, not eager count() actions
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      val t = Search.tfidfKeywords(corpus, col("doc_id"), col("text"), 2)
      val v = Search.vocabCoverage(corpus, col("text"), 5)
      Thread.sleep(300) // let any async job-start events drain
      assert(jobs.get() == 0,
        s"constructing tfidf/vocab frames launched ${jobs.get()} job(s) — must be lazy")
      // …and evaluating vocabCoverage reuses the one term-grain exchange for
      // both the window branch and the grand total (single corpus pass)
      v.collect()
      val plan = v.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
        s"vocabCoverage plan recomputes the term counts for the total:\n$plan")
      t.collect() // and tfidf still evaluates fine end-to-end
    } finally sc.removeSparkListener(listener)
  }

  test("lmFamiliarity matches a driver-side add-alpha bigram LM") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val alpha = 0.5
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val allBigrams = texts.values.toSeq.flatMap(ws => ws.zip(ws.drop(1)))
    val cBg = allBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cUg = allBigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val vocab = texts.values.flatten.toSet.size.toLong
    val expected = texts.map { case (id, ws) =>
      val bgs = ws.zip(ws.drop(1))
      val lp = bgs.map(b =>
        math.log((cBg(b) + alpha) / (cUg(b._1) + alpha * vocab))).sum
      id -> ((bgs.size.toLong, bgs.map(cBg).sum, bgs.map(b => cUg(b._1)).sum, lp))
    }
    val got = Search.lmFamiliarity(docs, col("doc_id"), col("text"), alpha)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == expected.keySet, "every document must be scored")
    expected.foreach { case (id, (n, bgm, ugm, lp)) =>
      val (gn, gbgm, gugm, glp, gavg) = got(id)
      assert(gn == n && gbgm == bgm && gugm == ugm, s"doc $id integer evidence")
      // engine sums the per-bigram logs in partition order — tolerance, not exact
      assert(math.abs(glp - lp) <= 1e-9 * math.max(1.0, math.abs(lp)), s"doc $id logprob")
      val expAvg = if (n == 0) 0.0 else glp / n.toDouble
      assert(math.abs(gavg - expAvg) < 1e-12, s"doc $id avg_logprob")
    }
    // the unseen-text path is sharp: an alien doc whose words appear nowhere
    // else contributes exactly singleton counts, so its logprob is
    // n · ln((1+α)/(1+α·V')) with V' the union vocabulary — checked exactly
    // (note add-α gives UNSEEN contexts a small denominator, so gibberish is
    // deliberately not claimed to be the global minimum; proper backoff is
    // out of scope)
    val s = spark
    import s.implicits._
    val alien = Seq((999999L, "zzq qxv vnm mkp pqr rst")).toDF("doc_id", "text")
    val scored = Search.lmFamiliarity(docs.select("doc_id", "text").union(alien),
      col("doc_id"), col("text"), alpha)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    val (an, abgm, alp) = scored(999999L)
    assert(an == 5L && abgm == 5L, "alien bigrams must be singletons")
    val expectedAlien = 5.0 * math.log((1.0 + alpha) / (1.0 + alpha * (vocab + 6)))
    assert(math.abs(alp - expectedAlien) <= 1e-12 * math.abs(expectedAlien),
      s"alien logprob $alp vs $expectedAlien")
  }

  private def md5Bucket(feat: String, nBuckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(feat.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % nBuckets
  }

  test("dsirWeights matches a driver-side hashed-ngram importance model") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nBuckets = 64
    val alpha = 1.0
    val texts = docs.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSeq,
        r.getString(2)))
    def featsOf(ws: Seq[String]): Seq[Long] =
      (ws ++ ws.zip(ws.drop(1)).map { case (a, b) => a + "" + b })
        .map(md5Bucket(_, nBuckets))
    val rawBuckets = texts.map { case (id, ws, _) => id -> featsOf(ws) }.toMap
    val cT = texts.filter(_._3 == "src0").flatMap(t => rawBuckets(t._1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cR = rawBuckets.values.flatten.toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTotal = cT.values.sum; val rTotal = cR.values.sum
    val expected = rawBuckets.map { case (id, bs) =>
      val lw = bs.map(b =>
        math.log((cT.getOrElse(b, 0L) + alpha) / (tTotal + alpha * nBuckets)) -
        math.log((cR(b) + alpha) / (rTotal + alpha * nBuckets))).sum
      id -> ((bs.size.toLong, bs.map(b => cT.getOrElse(b, 0L)).sum,
        bs.map(cR).sum, lw))
    }
    val target = docs.filter(col("source") === "src0")
    val got = Search.dsirWeights(docs, target, col("doc_id"), col("text"),
        nBuckets, alpha)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == expected.keySet, "every raw document must be scored")
    expected.foreach { case (id, (n, tm, rm, lw)) =>
      val (gn, gtm, grm, glw) = got(id)
      assert(gn == n && gtm == tm && grm == rm, s"doc $id integer evidence")
      assert(math.abs(glw - lw) <= 1e-9 * math.max(1.0, math.abs(lw)),
        s"doc $id logweight $glw vs $lw")
    }
    // target-resemblance sanity: the mean logweight of the target slice must
    // exceed the mean over everything else (the whole point of DSIR)
    val bySrc = texts.map { case (id, _, src) => id -> src }.toMap
    val (inT, outT) = got.toSeq.partition { case (id, _) => bySrc(id) == "src0" }
    val meanIn = inT.map(_._2._4).sum / inT.size
    val meanOut = outT.map(_._2._4).sum / outT.size
    assert(meanIn > meanOut,
      s"target docs must score more target-like ($meanIn vs $meanOut)")
  }

  test("dsirSelect keeps ceil(n·frac) top-weighted docs, deterministically") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val target = docs.filter(col("source") === "src0")
    val n = docs.count()
    val all = Search.dsirWeights(docs, target, col("doc_id"), col("text"), 64)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
      .sortBy { case (id, lw) => (-lw, id) }
    val k = math.ceil(n * 0.25).toLong
    val kept = Search.dsirSelect(docs, target, col("doc_id"), col("text"), 0.25, 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all.take(k.toInt).map(_._1).toSet)
    assert(Search.dsirSelect(docs, target, col("doc_id"), col("text"), 0.0, 64)
      .count() == 0L)
    assert(Search.dsirSelect(docs, target, col("doc_id"), col("text"), 1.0, 64)
      .count() == n)
  }
}
