package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic: per-trigger cost breakdown of the streaming-twin bench rows
  * (not part of the driver contract — records WHERE the per-trigger floor
  * goes for ARCHITECTURE §6). Replays the events table exactly like the
  * bench twins (12 time-ordered files, AvailableNow, sized state layout)
  * and prints each micro-batch's `durationMs` phases (addBatch,
  * walCommit, …) plus the state operators' commitTimeMs — the numbers that
  * decide provider/knob choices instead of guessing.
  *
  * Usage: runMain graft.tools.StreamProfile <sfDir> <shape> [variant]
  *   shape   = pairs | tumbling | sessionize
  *   variant = default | hdfs | rocksdb | rocksdb-notrack | shm | parts4
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shape = args.lift(1).getOrElse("pairs")
    val variant = args.lift(2).getOrElse("default")
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")

    val ckRootBase =
      if (variant == "shm" && new java.io.File("/dev/shm").isDirectory)
        java.nio.file.Paths.get("/dev/shm")
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val tmpRoot = java.nio.file.Files.createTempDirectory(ckRootBase, "graft_sprof")
    val tmp = tmpRoot.resolve("files").toString

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val parts =
      if (variant.contains("parts4")) "4"
      else if (variant.contains("parts2")) "2"
      else if (variant.contains("parts1")) "1"
      else "8"
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    if (variant.contains("rocksdb")) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      if (variant.contains("notrack"))
        spark.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
    }

    val ev = graft.tpch.RelationalQueries.readEvents(spark, sfDir)
    def orderedStream(df: DataFrame, tsCol: String): DataFrame = {
      df.repartitionByRange(12, col(tsCol)).write.mode("overwrite").parquet(tmp)
      val parts = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      val base = System.currentTimeMillis() - parts.length * 2000L
      parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 2000L) }
      spark.readStream.schema(spark.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
    }

    val t0 = System.nanoTime()
    val q = shape match {
      case "pairs" =>
        val stream = orderedStream(
          ev.select(col("event_id"), col("user_id"), col("event_type"), col("ts")), "ts")
        val clicks = stream.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
          .withWatermark("cts", "1 hour")
        val views = stream.filter(col("event_type") === "view")
          .select(col("user_id").as("vu"), col("ts").as("vts"), col("event_id").as("vid"))
          .withWatermark("vts", "1 hour")
        clicks.join(views,
            col("cu") === col("vu") &&
              col("vts") >= col("cts") - expr("interval 30 minutes") &&
              col("vts") <= col("cts"))
          .writeStream.format("memory").queryName("sprof_sink")
          .option("checkpointLocation", tmpRoot.resolve("ckpt").toString)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      case "tumbling" =>
        val stream = orderedStream(ev.select(col("ts"), col("event_type"),
          col("value").cast("decimal(15,2)").as("value")), "ts")
        graft.streaming.Streaming.windowedAggregate(stream, "ts", "10 minutes", "1 hour")
          .writeStream.format("memory").queryName("sprof_sink")
          .option("checkpointLocation", tmpRoot.resolve("ckpt").toString)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      case "sessionize" =>
        val stream = orderedStream(
          ev.select(col("ts"), col("user_id"), col("value")), "ts")
        graft.streaming.Streaming.sessionWindowAggregate(
            stream, "ts", "10 minutes", "30 minutes")
          .writeStream.format("memory").queryName("sprof_sink")
          .option("checkpointLocation", tmpRoot.resolve("ckpt").toString)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      case other => sys.error(s"unknown shape $other")
    }
    q.awaitTermination()
    val total = (System.nanoTime() - t0) / 1e9

    println(f"SPROF shape=$shape variant=$variant total_sec=$total%.2f " +
      s"batches=${q.recentProgress.length}")
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      val ops = p.stateOperators.map(so =>
        s"rows=${so.numRowsTotal} commitMs=${so.commitTimeMs}").mkString(" | ")
      println(s"SPROF batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${d} state[$ops]")
    }
    org.apache.spark.sql.graft.Bridge.unloadStateStores()
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(tmpRoot).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
