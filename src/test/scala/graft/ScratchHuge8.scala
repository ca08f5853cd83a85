package graft

/** Scratch 1e8 GC-floor experiment harness (r16 verdict #5):
  * `Test/runMain graft.ScratchHuge8 [build|zstore|both] [passes]` under
  * different env variants (SPARK_GRAFT_HUGE_GEN/SLICES/PERSIST,
  * SPARK_GRAFT_OFFHEAP) — one JVM per variant since the knobs are env-read.
  * Reports wall seconds + process-wide GC-time delta per pass.
  */
object ScratchHuge8 {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("build")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val rows = sys.env.getOrElse("SPARK_GRAFT_HUGE8_ROWS", "100000000").toLong
    val spark = Bench.session()
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def timed(name: String)(body: => Unit): Unit = {
      val g0 = gcMs; val t0 = System.nanoTime()
      body
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
        f"gc=${gcMs - g0} ms")
    }
    val variant = Seq("SPARK_GRAFT_HUGE_GEN", "SPARK_GRAFT_HUGE_SLICES",
      "SPARK_GRAFT_HUGE_PERSIST", "SPARK_GRAFT_OFFHEAP")
      .flatMap(k => sys.env.get(k).map(v => s"$k=$v")).mkString(" ") match {
      case "" => "baseline"; case s => s
    }
    println(s"[scratch] variant: $variant rows=$rows what=$what")
    // JIT warmup at 1e6 (untimed)
    graft.tpch.HugeModel.rebuild(spark, 1000000L)
    graft.tpch.HugeModel.drop(1000000L, blocking = true)
    if (what == "build" || what == "both") {
      (1 to passes).foreach { _ =>
        timed("huge8_build") { graft.tpch.HugeModel.rebuild(spark, rows); () }
      }
      graft.tpch.HugeModel.drop(rows, blocking = true)
      System.gc(); Thread.sleep(1500)
    }
    if (what == "zstore" || what == "both") {
      import org.apache.spark.sql.functions.{col, hash, lit, pmod}
      def zframe(n: Long) = spark.range(0, n).select(col("id"),
        pmod(hash(col("id")), lit(1024)).cast("long").as("a"),
        pmod(hash(col("id") * 3), lit(1024)).cast("long").as("b"),
        (col("id") % 97).cast("double").as("value"))
      (1 to passes).foreach { _ =>
        val d = java.nio.file.Files.createTempDirectory("scratch_z8").toString
        timed("huge8_pipe_zstore_build") {
          graft.pipeline.Layout.zorderWrite(spark, d, zframe(rows),
            Seq(col("a"), col("b")), bits = 10, numFiles = 64); ()
        }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      }
    }
    spark.stop()
  }
}
