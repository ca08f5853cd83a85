package graft.tools

import graft.core.{Cube, Dimension}
import graft.olap.Aggregates
import org.apache.spark.sql.functions._

/** Diagnostic: materialized-summary lifecycle timings at scale (not part of
  * the driver contract — records the §6d numbers for ARCHITECTURE).
  *
  * Builds the huge model at `rows` (default 1e7), re-dimensions dim0 with 10
  * mid-level groups (a real grain between leaf and All), then times:
  * materialize (full build), a steady-state summary-served read, a point
  * write → refreshPartial, and a full rebuild for comparison.
  *
  * Usage: runMain graft.tools.SummaryStress [rows]
  */
object SummaryStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SUMMARYSTRESS $label sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    val base0 = graft.tpch.HugeModel.at(spark, rows)
    val d0 = new Dimension("dim0")
    d0.edit()
    (0 until 100).foreach(m => d0.add(s"m$m"))
    (0 until 10).foreach(g => d0.add(s"g$g", (0 until 10).map(m => s"m${g * 10 + m}")))
    d0.add("All", (0 until 10).map(g => s"g$g"))
    d0.commit()
    // keep the shifted frame LAZY over the persisted base facts — a second
    // materialized 1e8-row copy alongside the base persist and the summary
    // checkpoint exhausts the 8g local session (measured: OOM at 1e8); the
    // cheap per-read withColumn is the memory-honest shape here
    val facts = base0.facts.withColumn("d0", (col("d0") - 1).cast("int"))
    val cube = new Cube("hugeg", d0 +: base0.dimensions.tail, spark, Some(facts))
    val grain = Some(1) +: Seq.fill(graft.tpch.HugeModel.NDims - 1)(Option.empty[Int])
    val summary = time("materialize")(Aggregates.materialize(cube, "huge_g", grain))
    println(s"SUMMARYSTRESS summary_rows=${summary.facts.count()}")
    val topAddr = Seq("All") ++ Seq.fill(7)("All")
    val g0Addr = Seq("g0") ++ Seq.fill(7)("All")
    time("summary_read_top")(summary.get(topAddr))
    time("summary_read_g0")(summary.get(g0Addr))
    val addr = Seq("m5") ++ Seq.fill(7)("m1")
    cube.set(addr, 123.0)
    time("refresh_partial")(Aggregates.refreshPartial(cube, summary)
      .getOrElse(sys.error("partial must be available")))
    time("rebuild_full")(Aggregates.rebuild(cube, summary))
    spark.stop()
  }
}
