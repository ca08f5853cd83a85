package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Diagnostic: does the Z-order layout actually prune (not part of the
  * driver contract — records the measured evidence for ARCHITECTURE).
  *
  * Writes the SAME synthetic (x, y, payload) data twice — linearly sorted
  * by x, and Morton-interleaved on (x, y) via [[graft.pipeline.Layout]] —
  * with small parquet row groups so min/max row-group pruning has
  * resolution, then measures WALL TIME and BYTES READ (task input metrics)
  * for three predicates: a 1-D range on x (linear layout's home game), a
  * 1-D range on y (linear layout's blind spot), and the 2-D box (the
  * z-layout's reason to exist).
  *
  * Usage: runMain graft.tools.ZorderStress [rows] [files]
  */
object ZorderStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def measure(label: String)(f: => Long): Unit = {
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give them a beat
      Thread.sleep(300)
      println(f"ZORDERSTRESS $label rows=$n sec=$sec%.3f mb_read=${bytesRead.get / 1e6}%.1f")
    }

    // x, y uniform in [0, 2^16): independent keys, both query-relevant
    val data = spark.range(rows).select(
      (xxhash64(col("id")).bitwiseAND(lit(0xFFFFL))).as("x"),
      (xxhash64(col("id"), lit(1)).bitwiseAND(lit(0xFFFFL))).as("y"),
      col("id").as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("zorderstress").toString
    val rgOpts = Map("parquet.block.size" -> (1 << 20).toString) // 1 MiB row groups

    data.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
      .write.options(rgOpts).parquet(s"$dir/linear")
    graft.pipeline.Layout.zorderLayout(data, Seq(col("x"), col("y")), bits = 16,
      numFiles = files)
      .drop("__z")
      .write.options(rgOpts).parquet(s"$dir/zorder")

    // ~1/16 of each axis -> box selects ~1/256 of rows; two rounds so the
    // second is free of first-touch costs (JIT, footer cache) — read the
    // round-2 lines
    val (lo, hi) = (30000L, 34096L)
    for (round <- 1 to 2; layout <- Seq("linear", "zorder")) {
      val t = spark.read.parquet(s"$dir/$layout")
      measure(s"r$round ${layout}_x_range")(t.filter(col("x").between(lo, hi)).count())
      measure(s"r$round ${layout}_y_range")(t.filter(col("y").between(lo, hi)).count())
      measure(s"r$round ${layout}_xy_box")(t.filter(col("x").between(lo, hi) &&
        col("y").between(lo, hi)).count())
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
