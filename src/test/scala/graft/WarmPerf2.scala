package graft

object WarmPerf2 {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session()
    @volatile var show = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (show) {
        val si = s.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val tm = si.taskMetrics
        System.err.println(f"[stage ${si.stageId}%3d] ${dur}%6.2f s tasks=${si.numTasks}%4d in=${tm.inputMetrics.recordsRead}%10d shufR=${tm.shuffleReadMetrics.recordsRead}%10d shufW=${tm.shuffleWriteMetrics.recordsWritten}%10d  ${si.name.split("\n").head.take(60)}")
      }
    })
    SparkEntry.queries("pipe_dedup_minhash")(spark, "/root/testdata/sf0.1").count()
    show = true
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("pipe_dedup_minhash")(spark, "/root/testdata/sf0.1").count()
    println(f"[warm2] total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    spark.stop()
  }
}
