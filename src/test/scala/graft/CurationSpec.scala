package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators: deterministic stratified sampling and
  * per-stratum quality top-k.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = (0L until 4000L).map { i =>
    (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else if (i % 4 == 2) "zh" else "ko")
  }.toDF("id", "lang")

  test("sampleStratified applies per-stratum rates within binomial noise") {
    val sampled = Curation.sampleStratified(corpus, col("id"), col("lang"),
      Map("en" -> 1.0, "de" -> 0.5, "zh" -> 0.25), 0.125, "seed1")
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 1000)                       // rate 1.0 keeps all
    assert(byLang("de") > 400 && byLang("de") < 600)   // 500 ± noise
    assert(byLang("zh") > 175 && byLang("zh") < 325)   // 250 ± noise
    assert(byLang("ko") > 75 && byLang("ko") < 175)    // default 0.125 → 125 ± noise
  }

  test("sampleStratified is deterministic and partitioning-independent") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Curation.sampleStratified(df, col("id"), col("lang"), Map("en" -> 0.5), 0.25, "s")
        .select("id").as[Long].collect().sorted.toSeq
    val once = ids(corpus)
    assert(ids(corpus.repartition(17)) == once) // same subset, any layout
    assert(ids(corpus.repartition(1)) == once)
  }

  test("different salts draw (near-)independent samples") {
    def keep(salt: String) = Curation.sampleStratified(
      corpus, col("id"), col("lang"), Map.empty, 0.5, salt)
      .select("id").as[Long].collect().toSet
    val a = keep("salt-a"); val b = keep("salt-b")
    val overlap = (a & b).size.toDouble / math.max(1, a.size)
    assert(overlap > 0.35 && overlap < 0.65) // ~rate of the second draw, not ~1
  }

  test("resampleStratified upsamples with whole copies plus a fractional draw") {
    val out = Curation.resampleStratified(corpus, col("id"), col("lang"),
      Map("en" -> 2.5, "de" -> 1.0, "zh" -> 0.0), 0.25, "seed1")
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") > 2300 && byLang("en") < 2700)  // 1000 docs × 2.5 ± noise
    assert(byLang("de") == 1000)                        // exactly one copy each
    assert(!byLang.contains("zh"))                      // rate 0 drops the stratum
    assert(byLang("ko") > 175 && byLang("ko") < 325)    // default 0.25 → 250 ± noise
    // copy indices are dense 0..n-1 per row
    val copies = out.filter(col("lang") === "en").groupBy("id")
      .agg(collect_list("copy").as("cs")).select("cs").as[Seq[Int]].collect()
    assert(copies.forall(cs => cs.sorted == (0 until cs.size)))
    assert(copies.forall(cs => cs.size == 2 || cs.size == 3))
  }

  test("resampleStratified at rates <= 1 equals sampleStratified with copy 0") {
    val rates = Map("en" -> 0.5, "de" -> 1.0)
    val sample = Curation.sampleStratified(corpus, col("id"), col("lang"), rates, 0.125, "s7")
      .select("id").as[Long].collect().sorted.toSeq
    val resample = Curation.resampleStratified(corpus, col("id"), col("lang"), rates, 0.125, "s7")
    assert(resample.select("id").as[Long].collect().sorted.toSeq == sample)
    assert(resample.select("copy").distinct().as[Int].collect().toSeq == Seq(0))
  }

  test("resampleStratified is partitioning-independent") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      Curation.resampleStratified(df, col("id"), col("lang"), Map("en" -> 3.25), 0.5, "s")
        .select("id", "copy").as[(Long, Int)].collect().sorted.toSeq
    val once = rows(corpus)
    assert(rows(corpus.repartition(17)) == once)
  }

  test("temperatureResample: α=0 equalizes budgets, α=1 keeps proportions, α=0.5 between") {
    // 9 + 36 docs: the skew where the α policy is visible
    val df = ((0L until 9L).map(i => (i, "lo")) ++ (100L until 136L).map(i => (i, "hi")))
      .toDF("id", "lang")
    def mixCounts(alpha: Double, budget: Long) =
      Curation.temperatureResample(df, col("id"), col("lang"), alpha, budget, "t1")
        .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tolerances are ~2σ of the binomial draw at these tiny strata
    // α=0: equal share — 13.5 expected per stratum (lo upsampled, hi cut)
    val a0 = mixCounts(0.0, 27)
    assert(math.abs(a0("lo") - 13.5) <= 4 && math.abs(a0("hi") - 13.5) <= 7, s"$a0")
    // α=1: natural proportions — rates ≈ budget/N uniformly over docs
    val a1 = mixCounts(1.0, 27)
    assert(math.abs(a1("lo") - 27.0 * 9 / 45) <= 4 && math.abs(a1("hi") - 27.0 * 36 / 45) <= 7, s"$a1")
    // α=0.5: q ∝ sqrt(n) → 1:2 → lo gets 9 of 27 (rate 1.0), hi 18 (rate 0.5)
    val ah = mixCounts(0.5, 27)
    assert(math.abs(ah("lo") - 9.0) <= 2 && math.abs(ah("hi") - 18.0) <= 6, s"$ah")
    // low-resource share clearly grows as α falls (13.5 vs 5.4 expected —
    // the gap dwarfs the draw noise)
    assert(a0("lo") > a1("lo"), s"$a0 $a1")
  }

  test("temperatureResample: null stratum fails loudly, not NPE (r9 advice)") {
    val df = Seq((1L, "en"), (2L, null.asInstanceOf[String]), (3L, "de"))
      .toDF("id", "lang")
    val e = intercept[IllegalArgumentException](
      Curation.temperatureResample(df, col("id"), col("lang"), 0.5, 10, "t1"))
    assert(e.getMessage.contains("null stratum"))
  }

  test("temperatureResample is deterministic and partitioning-independent") {
    val df = ((0L until 9L).map(i => (i, "lo")) ++ (100L until 136L).map(i => (i, "hi")))
      .toDF("id", "lang")
    def out(d: org.apache.spark.sql.DataFrame) =
      Curation.temperatureResample(d, col("id"), col("lang"), 0.5, 27, "t1")
        .select("id", "copy").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out(df) == out(df.repartition(7)))
  }

  test("curateCorpus composes purge, decontamination, quality floor, resample") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val eval = docs.filter(col("doc_id") % 97 === 0)
    val out = Curation.curateCorpus(docs, "doc_id", "text", eval, "text",
      qualityFloor = 0.6, stratumCol = col("lang"),
      rates = Map("en" -> 2.0, "fr" -> 0.75), defaultRate = 0.25, salt = "s42")
    val rows = out.select("doc_id", "lang", "copy").as[(Long, String, Int)].collect()
    assert(rows.nonEmpty)
    // en rate 2.0 = exactly two copies of every surviving en doc
    val enCopies = rows.filter(_._2 == "en").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(enCopies.nonEmpty && enCopies.values.forall(_ == Seq(0, 1)))
    // eval docs with >= 2 distinct 3-shingles always collide with themselves
    // (if they survived dedup) -> none may appear in the curated mix
    val evalIds = eval.filter(size(split(col("text"), " ")) >= 5)
      .select("doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet.intersect(evalIds).isEmpty)
    // quality floor: every surviving doc scores >= 0.6
    assert(out.select("quality").as[Double].collect().forall(_ >= 0.6))
  }

  test("topKPerStratum keeps the k best per stratum with deterministic ties") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.8), ("a", 4L, 0.1),
      ("b", 5L, 0.5), ("b", 6L, 0.5)).toDF("src", "id", "score")
    val top = Curation.topKPerStratum(df, col("id"), col("src"), col("score"), 2)
      .select("src", "id", "rank").as[(String, Long, Int)].collect().toSet
    // ties broken by ascending id: (a,2) ranks before (a,3); (b,5) before (b,6)
    assert(top == Set(("a", 1L, 1), ("a", 2L, 2), ("b", 5L, 1), ("b", 6L, 2)))
  }

  // ---- token-budget mixing --------------------------------------------------

  private def md5hex8(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  private lazy val tokCorpus = (0L until 2000L).map { i =>
    (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh", i % 17 + 1)
  }.toDF("id", "lang", "n_tokens")

  test("mixtureByTokenBudget matches a driver-side greedy-prefix oracle") {
    val budgets = Map("en" -> 900L, "de" -> 400L)
    val out = Curation.mixtureByTokenBudget(tokCorpus, col("id"), col("lang"),
      col("n_tokens"), budgets, defaultBudget = 250L, salt = "t1")
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    // oracle: per stratum, order by (md5 draw, id), keep while inclusive
    // running total fits — recomputed independently on the driver
    val rows = (0L until 2000L).map { i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh", i % 17 + 1)
    }
    val expect = rows.groupBy(_._2).flatMap { case (lang, rs) =>
      val budget = budgets.getOrElse(lang, 250L)
      var cum = 0L
      rs.sortBy(r => (md5hex8(s"${r._1}:t1"), r._1)).flatMap { r =>
        cum += r._3
        if (cum <= budget) Some(r._1 -> cum) else None
      }
    }.toMap
    assert(out == expect)
  }

  test("mixtureByTokenBudget is deterministic and partitioning-independent") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Curation.mixtureByTokenBudget(df, col("id"), col("lang"), col("n_tokens"),
        Map("en" -> 500L), 300L, "t2").select("id").as[Long].collect().sorted.toSeq
    val once = ids(tokCorpus)
    assert(once.nonEmpty)
    assert(ids(tokCorpus.repartition(13)) == once)
    assert(ids(tokCorpus.repartition(1)) == once)
  }

  test("mixtureByTokenBudgetBucketed respects per-bucket budgets and nests in the exact draw order") {
    val budgets = Map("en" -> 800L, "de" -> 400L)
    val out = Curation.mixtureByTokenBudgetBucketed(tokCorpus, col("id"),
      col("lang"), col("n_tokens"), budgets, defaultBudget = 400L,
      salt = "t3", nBuckets = 4)
    val perBucket = out.groupBy("lang", "bucket")
      .agg(max("cum_tokens").as("t")).select("lang", "t")
      .as[(String, Long)].collect()
    // every (stratum, bucket) prefix fits its budget/4 slice
    assert(perBucket.forall { case (lang, t) => t <= budgets.getOrElse(lang, 400L) / 4 })
    // the split never overfills a stratum, and every stratum kept something
    assert(out.select("lang").distinct().count() == 3)
    // determinism across partitionings
    val a = out.select("id").as[Long].collect().sorted.toSeq
    val b = Curation.mixtureByTokenBudgetBucketed(tokCorpus.repartition(11),
      col("id"), col("lang"), col("n_tokens"), budgets, 400L, "t3", 4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("assignShards: whole docs, bounded shard totals, driver-oracle parity") {
    val rnd = new scala.util.Random(5)
    val docs = (0L until 500L).map(i =>
      (i, if (i % 2 == 0) "web" else "books", 1L + rnd.nextInt(99))).toDF("id", "src", "tok")
    val cap = 300L
    val got = Curation.assignShards(docs, col("id"), col("src"), col("tok"), cap)
      .select(col("id"), col("src"), col("n_tokens"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // driver oracle: exclusive cumsum in id order per stratum, integral div
    val expected = got.groupBy(_._2).flatMap { case (_, rows) =>
      var off = 0L
      rows.toSeq.sortBy(_._1).map { case (id, src, tok, _) =>
        val sid = off / cap; off += tok; (id, sid)
      }
    }.toMap
    got.foreach { case (id, _, _, sid) => assert(sid == expected(id), s"doc $id") }
    // each doc appears exactly once (never split) and shard totals are
    // within one max-doc of the cap
    assert(got.map(_._1).distinct.length == 500)
    val totals = got.groupBy(r => (r._2, r._4)).map { case (_, rs) => rs.map(_._3).sum }
    totals.foreach(t => assert(t <= cap + 99, s"shard total $t"))
    // deterministic at any partitioning
    val re = Curation.assignShards(docs.repartition(13), col("id"), col("src"),
        col("tok"), cap)
      .select(col("id"), col("shard_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    got.foreach { case (id, _, _, sid) => assert(re(id) == sid) }
  }

  test("curateCorpusSemantic = curateCorpus minus the semantically contaminated ids") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val evalDocs = d.filter(col("doc_id") % 97 === 0)
    val (co, ev) = (e.filter(col("vec_id") % 97 =!= 0), e.filter(col("vec_id") % 97 === 0))
    val base = Curation.curateCorpus(d, "doc_id", "text", evalDocs, "text",
      qualityFloor = 0.6, stratumCol = col("lang"),
      rates = Map("en" -> 2.0, "fr" -> 0.75), defaultRate = 0.25, salt = "s42")
    val sem = Curation.curateCorpusSemantic(d, "doc_id", "text", evalDocs, "text",
      co, "vec_id", "embedding", ev, cosThreshold = 0.35,
      qualityFloor = 0.6, stratumCol = col("lang"),
      rates = Map("en" -> 2.0, "fr" -> 0.75), defaultRate = 0.25, salt = "s42")
    val bad = graft.pipeline.Similarity
      .semanticContaminationPairs(co, ev, 0.35)
      .select("corpus_id").as[Long].collect().toSet
    assert(bad.nonEmpty, "fixture must actually contaminate something")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("lang"), col("copy").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    val expected = rows(base).filterNot { case (id, _, _) => bad.contains(id) }
    assert(rows(sem) == expected,
      "the semantic stage must be exactly an id filter on the base composition")
  }
}
