package graft.tools

/** Diagnostic: time a single SparkEntry query by name (not part of the
  * driver contract — used to isolate per-query regressions without the
  * full bench sweep).
  *
  * Usage: runMain graft.tools.TimeOne <queryName> [sfDir] [reps]
  * (reps > 1 separates cold first-run cost from warm steady state.)
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    val reps = if (args.length > 2) args(2).toInt else 1
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"TIMEONE $name rep=$r rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
