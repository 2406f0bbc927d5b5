package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of battery entries (plan-audit helper). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (q <- args) {
      println(s"==== $q ====")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
