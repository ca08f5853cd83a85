package graft.tools

import graft.core.Cube

/** Diagnostic: fact-LAYOUT timings at scale (not part of the driver
  * contract — records the partitioned-backing numbers for ARCHITECTURE).
  *
  * Builds the huge model at `rows` (default 1e7), then times a SLICED
  * rollup (one dim0 member pinned, everything else rolled up — the
  * "one week of a decade" query) against the unlayouted in-memory frame,
  * the same cube after `compactToPartitioned` on dim0 (100 partitions),
  * and for contrast a full-resolution top-cell read, which partitioning
  * cannot help.
  *
  * Usage: runMain graft.tools.LayoutStress [rows]
  */
object LayoutStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"LAYOUTSTRESS $label sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    val base = graft.tpch.HugeModel.at(spark, rows)
    val cube = new Cube("hugelayout", base.dimensions, spark, Some(base.facts))
    cube.cacheEnabled = false
    val sliceAddr = Seq("m5") ++ Seq.fill(graft.tpch.HugeModel.NDims - 1)("All")
    val topAddr = Seq.fill(graft.tpch.HugeModel.NDims)("All")
    time("sliced_read_unlayouted")(cube.get(sliceAddr))
    time("sliced_read_unlayouted_2")(cube.get(sliceAddr))
    spark.sql("DROP TABLE IF EXISTS layout_stress_part")
    time("compact_to_partitioned")(
      require(cube.compactToPartitioned("layout_stress_part", Seq(0)),
        "partitioned compaction must land"))
    // the in-memory frame is gone from the plan: unpersist so the sliced
    // read genuinely measures the partitioned parquet scan
    base.facts.unpersist(true)
    time("sliced_read_partitioned_cold")(cube.get(sliceAddr))
    time("sliced_read_partitioned_warm")(cube.get(sliceAddr))
    time("top_read_partitioned")(cube.get(topAddr)) // full scan — no pruning
    val slicedPlan = cube.gridAggregate(
      Seq(base.dimensions(0).idOf("m5")).map(Seq(_)) ++
        (1 until graft.tpch.HugeModel.NDims).map(i =>
          Seq(base.dimensions(i).idOf("All"))))
      .queryExecution.executedPlan.treeString
    val pf = "PartitionFilters: \\[[^\\]]*d0[^\\]]*\\]".r.findFirstIn(slicedPlan)
    println(s"LAYOUTSTRESS partition_filter=${pf.getOrElse("ABSENT")}")
    spark.stop()
  }
}
