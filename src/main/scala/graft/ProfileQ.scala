package graft
import org.apache.spark.sql.SparkSession

/** Repeated-query profiling main: warm-vs-cold timings for a few battery
  * entries (bench-harness conditions, one JVM). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.queries.Battery.compiler(spark, dir)
    val qs = if (args.nonEmpty) args.toSeq.flatMap(q => Seq(q, q))
      else Seq("q_path_plus", "q_path_plus", "q_path_star", "q_path_star")
    for (q <- qs) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      df.count()
      graft.pipeline.ScratchCache.drain()
      println(f"$q%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
