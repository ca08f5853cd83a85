package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: print the formatted physical plan of named
  * `SparkEntry.queries` entries (default: the Bench headline set) against a
  * given SF dir. Usage:
  *
  *   sbt "runMain graft.tools.Explain /root/testdata/sf0.01 q1_pricing_summary pipe_sample_stratified"
  *
  * Read the output for: `PushedFilters`/`ReadSchema` on scans (pushdown +
  * pruning), `WholeStageCodegen` span boundaries, broadcast vs shuffle
  * exchanges, and AQE nodes.
  *
  * Caveat: building a gate's DataFrame runs its driver-side setup — model
  * build, and for the mutating/eager gates (`olap_undo`, `olap_saveload`,
  * the area writes, the scalar point reads) the mutation jobs themselves;
  * those gates return driver-materialized single-row frames whose plans are
  * trivial. Name the scan/join/agg-shaped queries you care about — the
  * default headline set is exactly those.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.Bench.headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          try println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable => println(s"[explain] $n failed: $e") }
        case None => println(s"[explain] unknown query '$n'")
      }
    }
    spark.stop()
  }
}
