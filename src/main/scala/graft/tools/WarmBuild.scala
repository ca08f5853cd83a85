package graft.tools

object WarmBuild {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session()
    // warm up exactly like Bench: smallest-SF query first
    graft.SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001").count()
    graft.tpch.TpchModel.get(spark, "/root/testdata/sf0.001")
    val t0 = System.nanoTime()
    graft.tpch.TpchModel.get(spark, "/root/testdata/sf0.1")
    println(f"WARMBUILD sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
