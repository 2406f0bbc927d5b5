package graft
import org.apache.spark.sql.SparkSession
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.queries.Battery.compiler(spark, dir)
    for (q <- Seq("q_cross_join", "q_cross_join", "q_describe", "q_describe", "q_agg_concat", "q_agg_concat")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"$q%-16s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
