package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming ingest merges micro-batches into a cube last-wins") {
    import spark.implicits._
    val db = TinyModel.build(spark)
    val cube = db.cube("sales")
    def id(d: String, m: String) = db.dimension(d).idOf(m)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Int, Int, Int, Int, Double)]
    val stream = mem.toDF().toDF("d0", "d1", "d2", "d3", "d4", "value")
    mem.addData(
      (id("years", "2021"), id("months", "Jan"), id("regions", "North"),
        id("products", "motorcycles"), id("measures", "Sales"), 100.0),
      (id("years", "2021"), id("months", "Jan"), id("regions", "North"),
        id("products", "sedan"), id("measures", "Sales"), 400.0),
      // same cell written twice in one batch — last wins
      (id("years", "2021"), id("months", "Jan"), id("regions", "North"),
        id("products", "motorcycles"), id("measures", "Sales"), 123.0))
    val q = Streaming.ingestInto(cube, stream)
    q.awaitTermination(60000)
    assert(cube.get(Seq("2021", "Jan", "North", "motorcycles", "Sales")).contains(123.0))
    assert(cube.get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(523.0))
  }

  test("file-stream ingest over 25 micro-batches keeps fact lineage bounded") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val db = TinyModel.build(spark)
    val cube = db.addCube("streamlineage", db.cube("sales").dimensions)
    def id(d: String, m: String) = db.dimension(d).idOf(m)
    // 25 one-row files → 25 micro-batches (maxFilesPerTrigger=1); each batch
    // stacks an anti-join+union layer, compacted every 10 batches
    val months = Seq("Jan", "Feb", "Mar", "Apr", "Mai", "Jun", "Jul", "Aug",
      "Sep", "Oct", "Nov", "Dec")
    val rows = (0 until 25).map { i =>
      Row(id("years", "2021"), id("months", months(i % 12)), id("regions", "North"),
        if (i < 12) id("products", "sedan")
        else if (i < 24) id("products", "coupe") else id("products", "sports"),
        id("measures", "Sales"), (i + 1) * 10.0)
    }
    val schema = StructType((0 to 4).map(i => StructField(s"d$i", IntegerType)) :+
      StructField("value", DoubleType))
    val tmp = java.nio.file.Files.createTempDirectory("graft_lineage").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 25), schema)
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(tmp)
    val q = Streaming.ingestInto(cube, stream,
      org.apache.spark.sql.streaming.Trigger.AvailableNow(), compactEvery = 10)
    q.awaitTermination(120000)
    // correctness: every distinct cell landed; totals match the batch sum
    assert(cube.cellsCount == 25)
    val expected = rows.map(_.getDouble(5)).sum
    assert(cube.get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(expected))
    // bounded lineage: without the every-10-batches localCheckpoint the plan
    // would carry 25 stacked anti-join+union layers; compaction resets it to
    // a flat scan plus at most compactEvery stacked layers
    val planLines = cube.facts.queryExecution.logical.numberedTreeString.linesIterator.size
    assert(planLines < 400, s"fact plan has $planLines lines — lineage not bounded")
  }

  test("concurrent reads during streaming ingest are consistent and lose nothing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val db = TinyModel.build(spark)
    val cube = db.addCube("streamconc", db.cube("sales").dimensions)
    def id(d: String, m: String) = db.dimension(d).idOf(m)
    val months = Seq("Jan", "Feb", "Mar", "Apr", "Mai", "Jun", "Jul", "Aug",
      "Sep", "Oct", "Nov", "Dec")
    // 25 equal-value cells over 25 micro-batches: every atomic batch merge
    // only ADDS whole cells, so any consistent read must be a multiple of
    // the cell value and the sequence non-decreasing — a torn read (partial
    // merge, half-lost overlay) shows up as a regression or an off-grid
    // value. Equal values keep the invariant independent of the (unordered)
    // file-to-batch assignment.
    val rows = (0 until 25).map { i =>
      Row(id("years", "2021"), id("months", months(i % 12)), id("regions", "North"),
        if (i < 12) id("products", "sedan")
        else if (i < 24) id("products", "coupe") else id("products", "sports"),
        id("measures", "Sales"), 10.0)
    }
    val schema = StructType((0 to 4).map(i => StructField(s"d$i", IntegerType)) :+
      StructField("value", DoubleType))
    val tmp = java.nio.file.Files.createTempDirectory("graft_conc").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 25), schema)
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(tmp)

    val readErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    @volatile var stopReader = false
    val reader = new Thread(() => {
      try while (!stopReader) {
        val v = cube.get(Seq("2021", "Year", "Total", "Total", "Sales")).getOrElse(0.0)
        observed.add(v)
        Thread.sleep(20) // backoff: don't saturate the scheduler — an
        // unthrottled job loop starves the stream on a contended host
      } catch { case t: Throwable => readErr.set(t) }
    }, "graft-conc-reader")
    reader.start()
    val q = Streaming.ingestInto(cube, stream,
      org.apache.spark.sql.streaming.Trigger.AvailableNow(), compactEvery = 10)
    // the boolean matters: false = still mid-ingest → every assert below
    // would be testing an unfinished stream, not the code under test
    assert(q.awaitTermination(180000), "stream did not finish within 180s")
    stopReader = true
    reader.join(30000)
    assert(readErr.get() == null, s"concurrent reader failed: ${readErr.get()}")
    val seq = observed.asScala.toVector
    assert(seq.nonEmpty, "reader never completed a read")
    assert(seq.zip(seq.tail).forall { case (a, b) => b >= a },
      s"totals regressed during ingest: ${seq.take(50)}")
    // whole-cell consistency: every observed total is k × 10 for some batch
    // count k — a fractional/partial state is a torn read
    assert(seq.forall(v => v >= 0 && v <= 250 && v % 10.0 == 0.0),
      s"observed an off-grid total: ${seq.filterNot(v => v % 10.0 == 0.0).take(5)}")
    // nothing lost: the final total is the full sum
    assert(cube.get(Seq("2021", "Year", "Total", "Total", "Sales"))
      .contains(rows.map(_.getDouble(5)).sum))
  }

  test("commitBulkMerge preserves interactive writes that land mid-merge") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("mergekeep", db.cube("sales").dimensions)
    def addr(p: String) = Seq("2021", "Jan", "North", p, "Sales")
    cube.set(addr("sedan"), 100.0) // in the overlay BEFORE the snapshot
    // the streaming batch takes its snapshot (incorporating sedan=100)…
    val (facts0, inc) = cube.bulkMergeSnapshot()
    // …and while its merge job "runs", two interactive writes land:
    cube.set(addr("coupe"), 50.0) // new key — must survive the swap
    cube.set(addr("sedan"), 77.0) // changed value — must survive the swap
    cube.commitBulkMerge(facts0, inc)
    // a plain replaceFacts here would have erased both racing writes
    assert(cube.get(addr("sedan")).contains(77.0))
    assert(cube.get(addr("coupe")).contains(50.0))
    // the incorporated write lives on in the base; totals see all three
    assert(cube.get(Seq("2021", "Jan", "North", "Total", "Sales")).contains(127.0))
  }

  test("compact() aborts the swap when a bulk write lands mid-materialization") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("compactrace", db.cube("sales").dimensions)
    def addr(p: String) = Seq("2021", "Jan", "North", p, "Sales")
    cube.set(addr("sedan"), 100.0)
    cube.compact() // baseline: a clean compact drains the overlay
    assert(cube.get(addr("sedan")).contains(100.0))

    // a bulk write (the streaming-batch shape) lands INSIDE compact's
    // materialize-outside-the-lock window: swapping the stale frame in
    // would silently revert it — compact must abandon the swap instead
    import org.apache.spark.sql.functions.{col, lit}
    cube.compactImpl { () =>
      cube.replaceFacts(cube.facts.withColumn("value", col("value") + lit(1.0)))
    }
    assert(cube.get(addr("sedan")).contains(101.0),
      "compact() reverted a bulk write that landed mid-materialization")

    // point writes in the window are preserved by the overlay filter even
    // when the swap goes through
    cube.compactImpl { () => cube.set(addr("coupe"), 7.0) }
    assert(cube.get(addr("coupe")).contains(7.0))
    assert(cube.get(addr("sedan")).contains(101.0))
  }

  test("watermarked tumbling window aggregation over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = Streaming.windowedAggregate(events, "ts", "10 minutes", "1 hour")
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("win_out").start()
    mem.addData(
      (ts("2024-01-01 00:10:00"), "click", 1.0),
      (ts("2024-01-01 00:50:00"), "click", 2.0),
      (ts("2024-01-01 01:10:00"), "click", 4.0),
      (ts("2024-01-01 00:20:00"), "view", 8.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM win_out").collect()
      .map(r => (r.getAs[Timestamp]("wstart").toString, r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    q.stop()
    assert(out(("2024-01-01 00:00:00.0", "click")) == (2L, 3.0))
    assert(out(("2024-01-01 01:00:00.0", "click")) == (1L, 4.0))
    assert(out(("2024-01-01 00:00:00.0", "view")) == (1L, 8.0))
  }

  test("streaming document intake: scoring, quality floor, fingerprint dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val out = Streaming.documentIntake(docs, "ts", "10 minutes", minQuality = 0.5)
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("intake_out").start()
    mem.addData(
      (ts("2024-01-01 00:00:00"), 1L, "the quick brown fox and the lazy dog"),
      // word-set duplicate of doc 1 (reordered + repeated) → dropped
      (ts("2024-01-01 00:01:00"), 2L, "lazy dog and the quick quick brown fox"),
      (ts("2024-01-01 00:02:00"), 3L, "the sun and the moon go to the sea in the night"),
      // no stopwords, overlong words → quality 0, below the floor → dropped
      (ts("2024-01-01 00:03:00"), 4L, "zzzzzzzzzzzz qqqqqqqqqqqq xxxxxxxxxxxx"),
      // empty doc → NaN ratios → must FAIL the floor, not bypass it
      (ts("2024-01-01 00:04:00"), 5L, ""))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM intake_out").collect()
    q.stop()
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.contains(3L))
    assert(!ids.contains(4L), "low-quality doc must be dropped by the floor")
    assert(!ids.contains(5L), "NaN-quality (empty) doc must be dropped by the floor")
    assert((ids - 3L).size == 1, s"exactly one of the near-dup pair survives, got $ids")
    assert(rows.forall(_.getAs[String]("lang_pred") != null))
  }

  test("dedupWithinWatermark: dups inside the horizon drop, expired keys re-emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val stream = mem.toDF().toDF("ts", "k", "v")
    val out = Streaming.dedupWithinWatermark(stream, "ts", "10 minutes", Seq("k"))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_wm_out").start()
    // batch 1: key 1 twice within the same minute → ONE survivor
    mem.addData((ts("2024-01-01 00:00:00"), 1L, "a"),
      (ts("2024-01-01 00:00:30"), 1L, "a-dup"),
      (ts("2024-01-01 00:01:00"), 2L, "b"))
    q.processAllAvailable()
    // batch 2: key 1 again 2 min later — still inside the 10-min horizon
    mem.addData((ts("2024-01-01 00:03:00"), 1L, "a-late-dup"))
    q.processAllAvailable()
    // batch 3: advance the watermark far past key 1's state…
    mem.addData((ts("2024-01-01 01:00:00"), 3L, "c"))
    q.processAllAvailable()
    // batch 4: …then key 1 REAPPEARS after expiry → re-emitted (the
    // bounded-state contract: exact-once only within the lateness horizon)
    mem.addData((ts("2024-01-01 01:01:00"), 1L, "a-again"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT k, v FROM dedup_wm_out").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    q.stop()
    assert(rows.count(_._1 == 1L) == 2, s"key 1 once per horizon: $rows")
    assert(rows.contains((1L, "a")) && rows.contains((1L, "a-again")))
    assert(!rows.exists(_._2.contains("dup")), s"in-horizon dups must drop: $rows")
    assert(rows.count(_._1 == 2L) == 1 && rows.count(_._1 == 3L) == 1)
  }

  test("near-dup novelty stream: batch-independent, exact-verified vs the index") {
    import graft.pipeline.TextDedup
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "colorless green ideas sleep furiously tonight")).toDF("doc_id", "text")
    val (idxB, idxW) = TextDedup.nearDupIndex(corpus, "doc_id", "text")
    val intake = Seq(
      // word-set duplicate of corpus doc 1 (reordered) → dropped
      (10L, "lazy dog the quick brown fox jumps over the"),
      // novel → admitted
      (11L, "entirely different words about spark plans and shuffles"),
      // near-dup of corpus doc 2 missing one word of ten? (6-of-6 subset
      // plus one extra word → J = 6/7 < 0.9 → ADMITTED: threshold is real)
      (12L, "colorless green ideas sleep furiously tonight extra"),
      // exact word-set of corpus doc 2 → dropped
      (13L, "tonight furiously sleep ideas green colorless")).toDF("doc_id", "text")
    // batch reference: one-shot application
    val oneShot = TextDedup.dropCorpusNearDups(intake, "doc_id", "text", idxB, idxW)
      .select("doc_id").as[Long].collect().toSet
    assert(oneShot == Set(11L, 12L))
    // streamed in two micro-batches → identical admitted set
    val tmp = java.nio.file.Files.createTempDirectory("neardup_stream")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    // a LIVE trigger: the AvailableNow default would stop after batch 1
    // and silently skip data added later (exactly what this spec must see)
    val q = Streaming.nearDupNovelStream(stream, "doc_id", "text", idxB, idxW,
      tmp.resolve("out").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      checkpointDir = Some(tmp.resolve("ckpt").toString))
    val rows = intake.as[(Long, String)].collect()
    mem.addData(rows.take(2).toSeq: _*)
    q.processAllAvailable()
    mem.addData(rows.drop(2).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(tmp.resolve("out").toString)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == oneShot, "admission must be batching-independent")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("stateless curation ops run unchanged on a stream: scrub + sample + resample") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "lang", "text")
    // scrub + deterministic resample are pure scan shapes (no state, no
    // shuffle), so the SAME call works on batch and streaming frames
    val curated = graft.pipeline.Curation.resampleStratified(
      docs.withColumn("text", graft.pipeline.TextAnalysis.scrubPii(col("text"))),
      col("doc_id"), col("lang"), Map("en" -> 2.0, "zh" -> 0.0), 1.0, "s1")
    val q = curated.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curate_stream").start()
    mem.addData(
      (1L, "en", "mail jane@example.org now"),
      (2L, "zh", "dropped entirely"),
      (3L, "de", "kept once"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM curate_stream").collect()
    q.stop()
    val byId = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byId(1L).length == 2 && !byId.contains(2L) && byId(3L).length == 1)
    assert(byId(1L).forall(_.getAs[String]("text") == "mail <EMAIL> now"))
    // batch twin computes the identical multiset
    val batch = graft.pipeline.Curation.resampleStratified(
      Seq((1L, "en", "mail <EMAIL> now"), (3L, "de", "kept once"))
        .toDF("doc_id", "lang", "text"),
      col("doc_id"), col("lang"), Map("en" -> 2.0, "zh" -> 0.0), 1.0, "s1")
      .select("doc_id", "copy").as[(Long, Int)].collect().sorted.toSeq
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("copy"))).sorted.toSeq == batch)
  }

  test("heavy hitters run unchanged on a stream: sketch bounds hold across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = graft.pipeline.TextAnalysis
      .heavyHitters(mem.toDF().toDF("text"), "text", capacity = 8)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hh_stream").start()
    try {
      mem.addData("a a a b b c", "a d e f"); q.processAllAvailable()
      mem.addData("a b g h i j k l m n"); q.processAllAvailable()
      val hh = spark.sql("SELECT * FROM hh_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(hh.length <= 8)
      val trueCounts = ("a a a b b c a d e f a b g h i j k l m n").split(" ")
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      hh.foreach { case (t, c, e) =>
        val tc = trueCounts(t)
        assert(c >= tc && tc >= c - e, s"bounds violated for $t: cnt=$c err=$e true=$tc")
      }
      // the clear heavy hitter survives every batch boundary
      assert(hh.exists(_._1 == "a"))
    } finally q.stop()
  }

  test("streaming corpus report: incremental leaf totals equal the batch rollup leaves") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val docs = mem.toDF().toDF("doc_id", "lang", "source", "text")
    val q = graft.streaming.Streaming
      .corpusReportStream(docs, "lang", "source", "text")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("corpus_stream").start()
    val batch1 = Seq(
      (1L, "en", "web", "the fast cat."),
      (2L, "en", "web", "of mice"),
      (3L, "de", "web", "der hund!"))
    val batch2 = Seq(
      (4L, "en", "books", "in in in"),
      (5L, "en", "web", "to be, or not"))
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM corpus_stream").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    q.stop()
    // batch twin over the union: leaf cells only (both strata non-null)
    val batchLeaves = graft.pipeline.TextAnalysis.corpusReport(
      (batch1 ++ batch2).toDF("doc_id", "lang", "source", "text"),
      "lang", "source", "text")
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(streamed == batchLeaves)
  }

  test("chunking and repetition signals run unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    // both are pure scan shapes (explode / array expressions): the SAME
    // calls work on batch and streaming frames with identical output
    val out = graft.pipeline.TextAnalysis.chunkDocuments(docs, col("text"), 3, 1)
      .withColumn("rep",
        graft.pipeline.TextAnalysis.repetitionSignals(col("text")).toMap.apply("dup_word_frac"))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("chunk_stream").start()
    mem.addData((1L, "a b c d e"), (2L, "x x x"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM chunk_stream").collect()
    q.stop()
    val batch = graft.pipeline.TextAnalysis.chunkDocuments(
      Seq((1L, "a b c d e"), (2L, "x x x")).toDF("doc_id", "text"), col("text"), 3, 1)
      .withColumn("rep",
        graft.pipeline.TextAnalysis.repetitionSignals(col("text")).toMap.apply("dup_word_frac"))
      .collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"),
        r.getAs[String]("chunk_text"), r.getAs[Double]("rep"))
    assert(rows.map(key).sorted.toSeq == batch.map(key).sorted.toSeq)
    assert(rows.nonEmpty)
  }

  test("session windows group events by gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val agg = Streaming.sessionWindowAggregate(events, "ts", "10 minutes", "30 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("sess_out").start()
    mem.addData(
      (ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      (ts("2024-01-01 00:10:00"), 1L, "click", 1.0),  // same session
      (ts("2024-01-01 02:00:00"), 1L, "click", 1.0),  // new session
      (ts("2024-01-01 00:05:00"), 2L, "view", 1.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM sess_out").collect()
    q.stop()
    assert(out.count(_.getAs[Long]("user_id") == 1L) == 2)
    assert(out.filter(_.getAs[Long]("user_id") == 1L).map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("stateful running totals via mapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.UserEvent]
    val q = Streaming.runningTotals(mem.toDS()).writeStream
      .outputMode(OutputMode.Update).format("memory").queryName("run_out").start()
    mem.addData(
      Streaming.UserEvent(1, ts("2024-01-01 00:00:00"), 5.0),
      Streaming.UserEvent(1, ts("2024-01-01 00:01:00"), 7.0),
      Streaming.UserEvent(2, ts("2024-01-01 00:02:00"), 1.0))
    q.processAllAvailable()
    mem.addData(Streaming.UserEvent(1, ts("2024-01-01 00:03:00"), 8.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM run_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")) -> r.getAs[Double]("total")).toMap
    q.stop()
    assert(out((1L, 2L)) == 12.0) // after first batch
    assert(out((1L, 3L)) == 20.0) // state carried across batches
    assert(out((2L, 1L)) == 1.0)
  }

  test("flatMapGroupsWithState burst detector emits 0..n alerts per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.UserEvent]
    val q = Streaming.burstAlerts(mem.toDS(), threshold = 3).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("burst_out").start()
    mem.addData(
      Streaming.UserEvent(1, ts("2024-01-01 00:00:00"), 1.0),
      Streaming.UserEvent(1, ts("2024-01-01 00:00:01"), 1.0))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM burst_out").count() == 0) // below threshold
    mem.addData(
      Streaming.UserEvent(1, ts("2024-01-01 00:00:02"), 1.0), // 3rd → alert, reset
      Streaming.UserEvent(2, ts("2024-01-01 00:00:03"), 1.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM burst_out").collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("user_id") == 1L && rows.head.getAs[Long]("n_in_burst") == 3L)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "k")
    val out = Streaming.dedupStream(stream, "ts", "1 hour", Seq("k"))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    mem.addData(
      (ts("2024-01-01 00:00:00"), "a"),
      (ts("2024-01-01 00:00:00"), "a"), // exact dup dropped
      (ts("2024-01-01 00:00:00"), "b"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM dedup_out").collect()
    q.stop()
    assert(rows.length == 2)
  }

  test("novelOnly: cross-batch dedup + stream-static anti vs the corpus index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val idx = graft.pipeline.TextDedup.fingerprintIndex(corpus, "text")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val out = graft.pipeline.TextDedup.novelOnly(stream, idx, "text")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("novel_out").start()
    // batch 1: one corpus dup (word-set equal, order differs) + one novel
    mem.addData((10L, "gamma beta alpha"), (11L, "delta epsilon"))
    q.processAllAvailable()
    // batch 2: a LATER repeat of batch 1's novel doc (cross-batch state must
    // drop it) + one genuinely new doc
    mem.addData((12L, "epsilon delta"), (13L, "zeta eta"))
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id FROM novel_out").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(11L, 13L),
      s"corpus dup and cross-batch repeat must be dropped, got $got")
    // batch-mode parity on the same frames: same surviving fingerprint set
    val batchFps = graft.pipeline.TextDedup.novelOnly(
      Seq((10L, "gamma beta alpha"), (11L, "delta epsilon"),
        (12L, "epsilon delta"), (13L, "zeta eta")).toDF("doc_id", "text"),
      idx, "text").select("fp").collect().map(_.getString(0)).toSet
    val streamFps = spark.sql("SELECT fp FROM novel_out").collect()
      .map(_.getString(0)).toSet
    assert(batchFps == streamFps, "batch and stream agree on the novel fp set")
  }

  test("stream-stream interval join replay equals the batch join (rel_event_pairs twins)") {
    // the two gate entries on the sf0.001 events — the full two-sided-state
    // stream-stream join path vs the one-shuffle batch plan, row-for-row
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = rows(graft.tpch.RelationalQueries
      .queries("rel_event_pairs")(spark, "/root/testdata/sf0.001"))
    val stream = rows(graft.tpch.StreamingQueries
      .queries("rel_event_pairs_stream")(spark, "/root/testdata/sf0.001"))
    assert(batch.nonEmpty && stream == batch,
      s"stream replay diverged: ${stream.diff(batch)} / ${batch.diff(stream)}")
  }
}
