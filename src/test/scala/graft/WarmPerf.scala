package graft

object WarmPerf {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("pipe_dedup_minhash")
    val sfDir = sys.env.getOrElse("SP_SF", "/root/testdata/sf0.1")
    val spark = Bench.session()
    names.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[warm] $name pass$i ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
