package graft.tools

import graft.tpch.HugeModel
import org.apache.spark.sql.functions._

/** Diagnostic: the huge model stressed AT scale — build, cold top cell,
  * bucketed compaction through the cube API, and the broadcast-off 10k
  * point batch over the bucketed backing, with the self-verifying asserts
  * held (value-1.0 cells ⇒ every aggregate equals its contributing row
  * count; build-seed addresses ⇒ every address hits). Not part of the
  * driver contract: run once per decade of rows to record ARCHITECTURE
  * §6d numbers (HugeScaleSpec holds the same asserts at 1e7 under CI).
  *
  * Usage: SPARK_GRAFT_HUGE_ROWS=1000000000 runMain graft.tools.HugeStress
  * (uses the bench session — local[32] — so numbers sit beside BENCH_r*.)
  */
object HugeStress {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_HUGE_ROWS", "1000000000").toLong
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_HUGE_BUCKETS", "8").toInt
    val spark = graft.Bench.session()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (cube, tBuild) = time(HugeModel.at(spark, rows))
    println(f"HUGESTRESS rows=$rows build=$tBuild%.1fs")

    cube.cacheEnabled = false
    val (top, tTop) = time(cube.get(Seq.fill(HugeModel.NDims)("All")))
    assert(top.contains(rows.toDouble), s"top cell $top != $rows")
    println(f"HUGESTRESS coldTop=$tTop%.2fs value=${top.get}%.0f")

    // Stage to plain parquet and RELEASE the in-heap persist before the
    // bucketed compaction: at 1e9 the MEMORY_AND_DISK block store's
    // protected storage region starves the bucket writers' sort buffers
    // (observed: UNABLE_TO_ACQUIRE_MEMORY at 12g). This is also the honest
    // 100 TB shape — compaction reads facts from files, not a hot cache.
    val tmpPlain = java.nio.file.Files.createTempDirectory("graft_hugestress").toString
    val (_, tPlain) = time(cube.facts.write.mode("overwrite").parquet(tmpPlain))
    cube.facts.unpersist(blocking = true)
    println(f"HUGESTRESS plainParquetWrite=$tPlain%.1fs")

    // bucketed compaction through the cube API (the 100 TB layout shape)
    val bcube = new graft.core.Cube("hugestress", cube.dimensions, spark,
      Some(spark.read.parquet(tmpPlain)))
    spark.sql("DROP TABLE IF EXISTS hugestress_bucketed")
    val (swapped, tBucket) = time(bcube.compactToBucketed("hugestress_bucketed", nBuckets))
    assert(swapped, "compactToBucketed must land")
    println(f"HUGESTRESS bucketedCompact=$tBucket%.1fs nBuckets=$nBuckets")

    // 10k build-seed addresses (all hit), broadcast OFF — the shuffle semi
    // join shape of an address list too big to broadcast
    val addrCols = (0 until HugeModel.NDims).map(i =>
      (pmod(xxhash64(col("id"), lit(i)), lit(HugeModel.LeavesPerDim)) + 1)
        .cast("int").as(s"d$i"))
    val addrs = spark.range(10000).select(addrCols: _*)
    val nDistinct = addrs.distinct().count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val plan = bcube.readBatch(addrs, broadcastAddrs = false)
      .queryExecution.executedPlan.toString
    val nExchange = "[+:]- Exchange".r.findAllIn(plan).length
    assert(nExchange == 1, s"expected fact side exchange-free, got $nExchange:\n$plan")
    val (nHit, tReads) = time(
      bcube.readBatch(addrs, broadcastAddrs = false).count())
    assert(nHit == nDistinct, s"expected every address to hit: $nHit of $nDistinct")
    println(f"HUGESTRESS bucketedPointBatch10k=$tReads%.1fs hits=$nHit exchanges=$nExchange")

    spark.sql("DROP TABLE IF EXISTS hugestress_bucketed")
    spark.stop()
  }
}
