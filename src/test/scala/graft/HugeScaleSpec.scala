package graft

import graft.tpch.HugeModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The huge model ONE ORDER UP from the reference's 1e6 benchmark: 1e7 rows,
  * where a local[4] run genuinely multi-waves its tasks and the groupBy
  * shuffle/AQE engage — the paths are the production ones (same build, same
  * closure-join rollup, same batched point-read shape), only the row count
  * moves. Self-verifying like HugeModelSpec: value-1.0 cells ⇒ every
  * aggregate equals its contributing row count.
  *
  * Measured numbers are recorded in ARCHITECTURE §6d.
  */
class HugeScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  test("order-up model: build, cold top cell, slice, dense grid, 10k point batch") {
    // default 1e7 keeps CI fast; SPARK_GRAFT_HUGE_ROWS=100000000 was run
    // once to record the 1e8 numbers in ARCHITECTURE §6d
    val rows = sys.env.getOrElse("SPARK_GRAFT_HUGE_ROWS", "10000000").toLong
    val (cube, tBuild) = time(HugeModel.at(spark, rows))

    // cold full-cube aggregation (caching off — the baseline-comparable read)
    cube.cacheEnabled = false
    val (top, tTop) = time(cube.get(Seq.fill(HugeModel.NDims)("All")))
    cube.cacheEnabled = true
    assert(top.contains(rows.toDouble))

    // one-dim slice equals its filter count (closure join + pushed filter)
    val m5Id = cube.dimensions(0).idOf("m5")
    val expected = cube.facts.filter(col("d0") === m5Id)
      .agg(sum("value")).head.getDouble(0)
    assert(cube.get(Seq("m5") ++ Seq.fill(HugeModel.NDims - 1)("All")).contains(expected))

    // dense grid: all 100 d0 leaves × All^7 in ONE job — cells partition the
    // row space, so the grid total must be exactly `rows`
    val sel = Seq(cube.dimensions(0).leafMembers.map(_.id)) ++
      (1 until HugeModel.NDims).map(i => Seq(cube.dimensions(i).idOf("All")))
    val (gridRow, tGrid) = time(
      cube.gridAggregate(sel).agg(count(lit(1)).as("n"), sum("value").as("total")).head)
    assert(gridRow.getLong(0) == HugeModel.LeavesPerDim.toLong)
    assert(gridRow.getDouble(1) == rows.toDouble)

    // 10k batched point reads in one broadcast-semi-join job. The bench's
    // random addresses nearly never land on occupied cells in a 100^8 space,
    // so here the addresses reuse the BUILD's hash seeds: every address is a
    // real cell, and the semi-join must return exactly one fact row per
    // distinct requested address
    val addrCols = (0 until HugeModel.NDims).map(i =>
      (pmod(xxhash64(col("id"), lit(i)), lit(HugeModel.LeavesPerDim)) + 1)
        .cast("int").as(s"d$i"))
    val addrs = spark.range(10000).select(addrCols: _*)
    val nDistinct = addrs.distinct().count()
    val (nHit, tReads) = time(
      cube.facts.join(broadcast(addrs),
        (0 until HugeModel.NDims).map(i => s"d$i"), "left_semi").count())
    assert(nHit == nDistinct,
      s"expected every requested address to resolve: $nHit of $nDistinct")

    info(f"$rows rows: build=$tBuild%.1fs coldTop=$tTop%.2fs grid100=$tGrid%.2fs " +
      f"pointBatch10k=$tReads%.2fs hits=$nHit")

    // release the large persisted frame so later suites in the shared
    // session don't carry it
    cube.facts.unpersist(blocking = true)
  }

  test("bucketed fact layout: exchange-free fact side THROUGH the cube API") {
    val rows = sys.env.getOrElse("SPARK_GRAFT_HUGE_ROWS", "10000000").toLong
    val cube = HugeModel.at(spark, rows)
    val dimCols = (0 until HugeModel.NDims).map(i => s"d$i")
    // the previous test released the persist; re-pin so the writes below
    // don't each recompute the build
    cube.facts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()

    // the layout knob, now a CUBE MODE: compactToBucketed materializes the
    // facts hash-bucketed + sorted on the full address and swaps them in as
    // the cube's backing frame, so repeated key joins/aggs co-locate without
    // shuffling the fact side — the 100 TB answer to the point-batch spill
    // re-read (§6d: 10.2 s at 1e8 was the persisted frame re-read against a
    // broadcast)
    spark.sql("DROP TABLE IF EXISTS huge_bucketed")
    val tmpPlain = java.nio.file.Files.createTempDirectory("graft_plainfacts").toString
    cube.facts.write.mode("overwrite").parquet(tmpPlain)
    val plain = spark.read.parquet(tmpPlain)
    val bcube = new graft.core.Cube("hugeb", cube.dimensions, spark, Some(cube.facts))
    val (swapped, tWrite) = time(bcube.compactToBucketed("huge_bucketed", 8))
    assert(swapped, "compactToBucketed must land on an uncontended cube")

    // build-seed addresses: every one a real cell (same contract as the
    // point-batch test above)
    val addrCols = (0 until HugeModel.NDims).map(i =>
      (pmod(xxhash64(col("id"), lit(i)), lit(HugeModel.LeavesPerDim)) + 1)
        .cast("int").as(s"d$i"))
    val addrs = spark.range(10000).select(addrCols: _*)
    val nDistinct = addrs.distinct().count()

    // force the shuffle-join shape (the 100 TB shape: an address list too
    // big to broadcast) and compare layouts
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqeBc = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // node lines print as "+- Exchange …" / ":- Exchange …" at any tree
      // depth; ReusedExchange deliberately not counted ("- Reused…")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "[+:]- Exchange".r
          .findAllIn(df.queryExecution.executedPlan.toString).length

      val plainJoin = plain.join(addrs, dimCols, "left_semi")
      // the CUBE-API read over the bucketed-backed cube — not a hand join
      val bucketedJoin = bcube.readBatch(addrs, broadcastAddrs = false)
      // plain layout shuffles BOTH sides; bucketed shuffles only the
      // (small) address side — the fact side reads its buckets in place
      assert(exchanges(plainJoin) == 2,
        s"expected 2 exchanges on the plain layout:\n${plainJoin.queryExecution.executedPlan}")
      assert(exchanges(bucketedJoin) == 1,
        s"expected the fact side exchange-free:\n${bucketedJoin.queryExecution.executedPlan}")
      // …and SORT-free: one file per bucket + trusted sortBy order means the
      // merge join streams the buckets as-is (round 7; the fact branch is
      // the SortMergeJoin's first ':-' child — it must not be a Sort)
      val bPlan = bucketedJoin.queryExecution.executedPlan.toString
      val factBranch = bPlan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin"))
        .find(_.trim.startsWith(":-"))
      assert(factBranch.exists(!_.contains("Sort")),
        s"expected the fact side sort-free:\n$bPlan")

      val (nPlain, tPlain) = time(plainJoin.count())
      val (nBucketed, tBucketed) = time(bucketedJoin.count())
      assert(nPlain == nDistinct && nBucketed == nDistinct)

      // address-grain aggregation over the bucketed-backed cube: NO exchange
      // at all — the shuffle the compaction pays once, amortized forever after
      val agg = bcube.facts.groupBy(dimCols.map(col): _*).agg(sum("value").as("v"))
      assert(exchanges(agg) == 0,
        s"bucketed address-grain agg must not shuffle:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == bcube.facts.count())

      // the bucketed backing serves the whole read surface, not just joins:
      // the top cell still aggregates to the row count
      assert(bcube.get(Seq.fill(HugeModel.NDims)("All")).contains(rows.toDouble))

      // a point write degrades gracefully: overlay merges over the bucketed
      // base (exchanges return), reads stay CORRECT
      val probe = addrs.limit(1).head()
      val probeAddr = (0 until HugeModel.NDims).map(i => s"m${probe.getInt(i) - 1}")
      bcube.set(probeAddr, 123.0)
      assert(bcube.readBatch(addrs, broadcastAddrs = false).count() == nDistinct)
      assert(bcube.get(probeAddr).contains(123.0))

      info(f"$rows rows: bucketedCompact=$tWrite%.1fs shuffleSemiJoin " +
        f"plain=$tPlain%.2fs bucketed=$tBucketed%.2fs hits=$nBucketed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      // unset when originally unset — restoring nothing would leak -1 into
      // the shared session and disable AQE broadcast joins for later suites
      prevAqeBc match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP TABLE IF EXISTS huge_bucketed")
      cube.facts.unpersist(blocking = true)
    }
  }
}
