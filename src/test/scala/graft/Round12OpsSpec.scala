package graft

import graft.pipeline.{EntityResolution, Layout, TextDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the round-12 operator additions: Bloom-prefiltered
  * decontamination (exactness vs the broadcast path + the plan-shape pin
  * that the prefilter really sits in the scan stage), deletion-neighborhood
  * fuzzy joins (exact recall/precision vs a brute-force levenshtein
  * cross-check), and Z-order layout (known Morton codes, SQL twin parity,
  * and the disjoint-z-range clustering property the pruning story rests
  * on).
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("bloom decontamination is row-identical to the exact broadcast path") {
    val evalDf = docs.filter(col("doc_id") % 97 === 0)
    val exact = TextDedup.decontaminate(docs, "doc_id", "text",
      evalDf, "text", shingle = 3, minHits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = TextDedup.decontaminateBloom(docs, "doc_id", "text",
      evalDf, "text", shingle = 3, minHits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloom == exact,
      "Bloom has no false negatives and the equi-join verify kills the " +
        "false positives — results must match exactly")
  }

  test("bloom decontamination plan probes might_contain; empty eval passes through") {
    val s = spark
    import s.implicits._
    val evalDf = docs.filter(col("doc_id") % 97 === 0)
    val plan = TextDedup.decontaminateBloom(docs, "doc_id", "text",
      evalDf, "text").queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "the Bloom probe must appear in the physical plan (scan-stage prefilter)")
    val empty = Seq.empty[String].toDF("text")
    val out = TextDedup.decontaminateBloom(docs, "doc_id", "text",
      empty, "text")
    assert(out.count() == docs.count(), "empty eval set: nothing is purged")
  }

  test("fuzzy join finds exactly the brute-force levenshtein pairs (k=1 and k=2)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "martha"), (2L, "jonathan"), (3L, "marhta"),
      (4L, "abc"), (5L, "zzzzzz")).toDF("lid", "ls")
    val right = Seq((10L, "martha"), (11L, "jonathann"), (12L, "marta"),
      (13L, "ab"), (14L, "axc"), (15L, "qqqqqq")).toDF("rid", "rs")
    for (k <- Seq(1, 2)) {
      val got = EntityResolution.fuzzyJoin(left, "lid", "ls", right, "rid", "rs", k)
        .select("lid", "rid", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = left.crossJoin(right)
        .withColumn("d", levenshtein(col("ls"), col("rs")))
        .filter(col("d") <= k)
        .select("lid", "rid", "d").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"k=$k: substitution, insertion AND deletion " +
        "edits must all be recalled (FastSS pigeonhole) with no extras")
    }
  }

  test("fuzzy join recalls 300 random <=k-edit corruptions exactly (k=1 and k=2)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42) // fixed seed: deterministic CI
    val alpha = "abcdefgh" // small alphabet → plenty of accidental near-pairs
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    def edit1(w: String): String = rnd.nextInt(3) match {
      case 0 if w.nonEmpty => // substitute
        val i = rnd.nextInt(w.length)
        w.updated(i, alpha(rnd.nextInt(alpha.length)))
      case 1 if w.nonEmpty => // delete
        val i = rnd.nextInt(w.length); w.substring(0, i) + w.substring(i + 1)
      case _ => // insert
        val i = rnd.nextInt(w.length + 1)
        w.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + w.substring(i)
    }
    for (k <- Seq(1, 2)) {
      val base = (0 until 300).map(i => (i.toLong, randStr(6 + rnd.nextInt(6))))
      val dirty = base.map { case (i, w) =>
        (i + 1000L, (1 to rnd.nextInt(k + 1)).foldLeft(w)((x, _) => edit1(x)))
      }
      val left = base.toDF("lid", "ls")
      val right = dirty.toDF("rid", "rs")
      val got = EntityResolution.fuzzyJoin(left, "lid", "ls", right, "rid", "rs", k)
        .select("lid", "rid", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = left.crossJoin(right)
        .withColumn("d", levenshtein(col("ls"), col("rs")))
        .filter(col("d") <= k)
        .select("lid", "rid", "d").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want,
        s"k=$k: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.size >= 300, s"k=$k: every corruption must at least match its source")
    }
  }

  test("fuzzy self pairs: ordered, deduplicated, within distance") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha"), (2L, "alphb"), (3L, "alpha"), (4L, "beta"))
      .toDF("id", "nm")
    val pairs = EntityResolution.fuzzySelfPairs(df, "id", "nm", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 1), (1L, 3L, 0), (2L, 3L, 1)))
  }

  test("streaming ER intake equals the one-shot batch match (batching-invariant)") {
    import org.apache.spark.sql.functions.{col, concat, hash, length, lit, pmod, substr}
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val idx = EntityResolution.variantIndex(c, "c_custkey", "c_name")
    val p = lit(1) + col("c_custkey") % length(col("c_name"))
    val dirty = c.select(col("c_custkey").as("did"),
      concat(substr(col("c_name"), lit(1), p - 1), lit("x"),
        substr(col("c_name"), p + 1, length(col("c_name")))).as("dnm"))
    val oneShot = EntityResolution.matchAgainstIndex(dirty, "did", "dnm",
      idx, "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val tmpRoot = java.nio.file.Files.createTempDirectory("spec_stream_er")
    val tmp = tmpRoot.resolve("files").toString
    dirty.withColumn("part", pmod(hash(col("did")), lit(4)))
      .repartition(4, col("part")).drop("part")
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(spark.read.parquet(tmp).schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val outDir = tmpRoot.resolve("matched").toString
    val q = graft.streaming.Streaming.erMatchStream(stream, "did", "dnm",
      idx, "c_custkey", outDir,
      checkpointDir = Some(tmpRoot.resolve("ckpt").toString))
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .select("did", "c_custkey", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    org.apache.spark.sql.graft.Bridge.unloadStateStores()
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(tmpRoot).iterator().asScala.toSeq.reverse
      .foreach(pth => java.nio.file.Files.deleteIfExists(pth))
    assert(streamed == oneShot && oneShot.nonEmpty,
      "per-record decisions against a static index must be batching-invariant")
  }

  test("zValue interleaves bits (known Morton codes) and masks overflow") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L), (5L, 0L))
      .toDF("x", "y")
    val got = df.select(Layout.zValue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit i of x -> position 2i; bit i of y -> position 2i+1; bits=2 masks x=5 to 1
    assert(got == Seq(1L, 2L, 15L, 6L, 1L))
  }

  test("zValue matches a reference Morton implementation on the events slice") {
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), floor(col("value")).cast("long").as("v"))
      .withColumn("z", Layout.zValue(Seq(col("user_id"), col("v")), bits = 10))
      .limit(500).collect()
    def morton(x: Long, y: Long): Long =
      (0 until 10).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    rows.foreach { r =>
      assert(r.getAs[Long]("z") == morton(r.getLong(0), r.getLong(1)))
    }
  }

  test("every gate has an oracle and every oracle a gate (driver-contract invariant)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"gates without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("funnel: strict order, first-touch times, span bound") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val events = Seq(
      // u1 completes in order
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
      // u2 clicks BEFORE viewing: click must not count (strict order),
      // and the later click does
      (2L, "click", ts(0)), (2L, "view", ts(2)), (2L, "click", ts(4)),
      // u3 views only
      (3L, "view", ts(1)),
      // u4 completes but the purchase is far out (span test)
      (4L, "view", ts(0)), (4L, "click", ts(1)), (4L, "purchase", ts(50))
    ).toDF("user_id", "event_type", "ts")
    val counts = graft.ops.Relational.funnelCounts(events, col("user_id"),
      col("event_type"), col("ts"), Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts == Map(1 -> 4, 2 -> 3, 3 -> 2),
      "u1..u4 view; u1,u2,u4 click in order; u1,u4 purchase")
    val spanned = graft.ops.Relational.funnelCounts(events, col("user_id"),
      col("event_type"), col("ts"), Seq("view", "click", "purchase"),
      maxSpan = Some("30 MINUTES"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(spanned == Map(1 -> 4, 2 -> 3, 3 -> 1),
      "u4's purchase at +50min falls outside the 30min span")
  }

  test("wordpieceEncode: greedy longest match, unknown fallback, losslessness") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abc zq"), (2L, "")).toDF("doc_id", "text")
    val vocab = Set("a", "ab", "bc", "c", "z")
    val toks = graft.pipeline.TextAnalysis.wordpieceEncode(df, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // greedy takes `ab` at position 0 (longest prefix), NOT the globally
    // cheaper [a, bc] — WordPiece's published behavior; `q` is out-of-vocab
    // and falls back to itself, so concatenation always reproduces the word
    assert(toks(1L) == Seq("ab", "c", "z", "q"))
    assert(toks(2L).isEmpty)
  }

  test("nearDupIndexAppend is row-identical to a full index rebuild") {
    import org.apache.spark.sql.functions.col
    val d = docs
    val (b0, w0) = TextDedup.nearDupIndex(d.filter(col("doc_id") < 250), "doc_id", "text")
    val add = d.filter(col("doc_id") >= 250 && col("doc_id") < 350)
    val (bg, wg) = TextDedup.nearDupIndexAppend(b0, w0, add, "doc_id", "text")
    val (bf, wf) = TextDedup.nearDupIndex(d.filter(col("doc_id") < 350), "doc_id", "text")
    def bandSet(f: org.apache.spark.sql.DataFrame) = f.collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(bandSet(bg) == bandSet(bf), "band rows must match the rebuild")
    def wordSet(f: org.apache.spark.sql.DataFrame) = f.collect()
      .map(r => (r.get(0), r.getSeq[Long](1))).toSet
    assert(wordSet(wg) == wordSet(wf), "word rows must match the rebuild")
  }

  test("splitCorpus: total, disjoint, near the asked fractions, partitioning-invariant") {
    import org.apache.spark.sql.functions.col
    val d = docs
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val out = graft.pipeline.Curation.splitCorpus(d, col("doc_id"), splits, "s1")
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = d.count().toDouble
    assert(counts.values.sum == n.toLong, "every row lands in exactly one split")
    splits.foreach { case (name, f) =>
      val got = counts.getOrElse(name, 0L) / n
      assert(math.abs(got - f) < 0.08, s"$name: got $got, asked $f")
    }
    val again = graft.pipeline.Curation.splitCorpus(d.repartition(7), col("doc_id"),
      splits, "s1").select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val first = out.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == first, "assignment must not depend on partitioning")
  }

  test("splitByCluster: every near-dup cluster lands whole in one split") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val d = docs
    val clusters = TextDedup.dedupClusters(
      TextDedup.minhashLshPairs(d, "doc_id", "text", 64, 16, 0.9))
      .select(col("id").as("doc_id"), col("cluster_id"))
    assert(clusters.count() > 0, "fixture needs actual near-dup clusters")
    val out = graft.pipeline.Curation.splitByCluster(d, "doc_id", clusters,
      "cluster_id", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), "s1")
    val violating = out.join(clusters, "doc_id")
      .groupBy("cluster_id").agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(violating == 0, "a cluster straddling splits is train→test leakage")
    assert(out.count() == d.count(), "cluster routing must not drop or dup docs")
    // the leakage report agrees: zero off-diagonal pairs for the
    // cluster-grain split, and the doc-grain split shows what it prevents
    val pairs = TextDedup.minhashLshPairs(d, "doc_id", "text", 64, 16, 0.9)
    val safe = graft.pipeline.Curation.splitLeakageReport(out, "doc_id",
      "split", pairs).filter(col("split_a") =!= col("split_b")).count()
    assert(safe == 0, "splitByCluster must zero the leakage report")
  }

  test("splitByCluster: string document ids draw distinctly (no null-cast collapse)") {
    // A long-cast draw key would null out on non-numeric ids, sending ALL
    // such rows to the last split on a shared null draw. String-keyed
    // drawing must spread them and keep clusters whole.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct}
    val d = (1 to 400).map(i => (s"doc-$i", s"text $i")).toDF("doc_id", "text")
    val clusters = Seq(("doc-1", "c0"), ("doc-2", "c0"), ("doc-3", "c1"),
      ("doc-4", "c1")).toDF("doc_id", "cluster_id")
    val out = graft.pipeline.Curation.splitByCluster(d, "doc_id", clusters,
      "cluster_id", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), "s1")
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 400L, "total and disjoint")
    assert(counts.keySet == Set("train", "val", "test"),
      s"string ids must spread over all splits, got $counts")
    assert(counts("train") > 250 && counts("train") < 380,
      s"train should be ~80%, got ${counts("train")} — a null-draw collapse " +
        "would dump everything in one split")
    val violating = out.join(clusters, "doc_id")
      .groupBy("cluster_id").agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(violating == 0, "clusters must still route whole on string ids")
  }

  test("z-ordered compaction serves identical values; overlay writes still win") {
    val db = TinyModel.build(spark)
    val c0 = db.cube("sales")
    val cube = new graft.core.Cube("sales_zord", c0.dimensions, spark, Some(c0.facts))
    cube.cacheEnabled = false
    val a = Seq("2021", "Jan", "North", "motorcycles", "Sales")
    val b = Seq("2022", "Feb", "South", "sedan", "Sales")
    cube.set(a, 123.0)
    cube.set(b, 456.0)
    val top = Seq("All years", "Year", "Total", "Total", "Sales")
    val before = (cube.get(a), cube.get(b), cube.get(top))
    spark.sql("DROP TABLE IF EXISTS spec_zordered_facts")
    assert(cube.compactToZordered("spec_zordered_facts", Seq(0, 1), files = 4))
    assert((cube.get(a), cube.get(b), cube.get(top)) == before,
      "the layout changes the scan, never the numbers")
    cube.set(a, 999.0) // overlay after compaction must shadow the z-backed base
    assert(cube.get(a).contains(999.0))
    assert(cube.get(top).contains(999.0 + 456.0))
    // degenerate and single-dim interleaves are refused
    intercept[IllegalArgumentException] {
      cube.compactToZordered("spec_zordered_bad", Seq(0))
    }
  }

  test("zorderLayout yields disjoint per-partition z ranges, sorted within") {
    val e = spark.read.parquet(s"$dir/events.parquet")
    val laid = Layout.zorderLayout(e,
      Seq(col("user_id"), floor(col("value")).cast("long")), bits = 10,
      numFiles = 8)
    val ranges = laid
      .select(spark_partition_id().as("p"), col("__z"))
      .groupBy("p").agg(min("__z").as("lo"), max("__z").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.nonEmpty && ranges.sliding(2).forall {
      case Array(a, b) => a._2 <= b._1
      case _ => true
    }, s"z ranges must not overlap across output files: ${ranges.mkString(",")}")
  }
}
