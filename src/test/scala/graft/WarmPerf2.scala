package graft

object WarmPerf2 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("pipe_dedup_minhash")
    val sfDir = sys.env.getOrElse("SP_SF", "/root/testdata/sf0.1")
    val spark = Bench.session()
    @volatile var show = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (show) {
        val si = s.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val tm = si.taskMetrics
        System.err.println(f"[stage ${si.stageId}%3d] ${dur}%6.2f s tasks=${si.numTasks}%4d " +
          f"run=${tm.executorRunTime / 1000.0}%7.1f cpu=${tm.executorCpuTime / 1e9}%7.1f " +
          f"gc=${tm.jvmGCTime / 1000.0}%5.1f spillM=${tm.memoryBytesSpilled / 1048576}%5d " +
          f"spillD=${tm.diskBytesSpilled / 1048576}%5d " +
          f"in=${tm.inputMetrics.recordsRead}%9d shufR=${tm.shuffleReadMetrics.recordsRead}%9d " +
          f"shufW=${tm.shuffleWriteMetrics.recordsWritten}%9d  ${si.name.split("\n").head.take(50)}")
      }
    })
    SparkEntry.queries(name)(spark, sfDir).count()
    show = true
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[warm2] total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    spark.stop()
  }
}
