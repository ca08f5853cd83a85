package graft

import org.apache.spark.sql.SparkSession

/** Scratch perf harness: cold-JVM timing of a single query
  * (`Test/runMain graft.ScratchPerf <queryName> [sfDir]`).
  */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("pipe_dedup_minhash")
    val sfDir = sys.env.getOrElse("SP_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val explain = sys.env.contains("SP_EXPLAIN")
    names.foreach { name =>
      if (explain) {
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      } else {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"cold $name ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
