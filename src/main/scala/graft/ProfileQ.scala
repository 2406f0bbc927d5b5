package graft
import org.apache.spark.sql.SparkSession

/** Repeated-query profiling main: warm-vs-cold timings for a few battery
  * entries (bench-harness conditions, one JVM). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.queries.Battery.compiler(spark, dir)
    val qs = if (args.nonEmpty) args.toSeq.flatMap(q => Seq(q, q))
      else Seq("q_path_plus", "q_path_plus", "q_path_star", "q_path_star")
    // optional per-stage attribution: SPARK_GRAFT_STAGES=1 prints each
    // completed stage's wall time / task time / shuffle bytes for the
    // SECOND (warm) run of each query
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (sys.env.get("SPARK_GRAFT_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          val m = si.taskMetrics
          stages.add(f"    stage ${si.stageId}%4d ${wall}%6.2fs wall " +
            f"${m.executorRunTime / 1e3}%7.2fs task ${si.numTasks}%4d tasks " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1fMB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1fMB " +
            si.name.takeWhile(_ != '\n').take(60))
        }
      })
    for (q <- qs) {
      stages.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      df.count()
      graft.pipeline.ScratchCache.drain()
      println(f"$q%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(100)
      stages.forEach(println(_))
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
