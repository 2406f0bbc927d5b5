package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` output for battery queries to files —
  * the plan-evidence artifacts committed under plans/<round>/.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [q1,q2,...]
  * (no query list = all declared queries). Same session config as Bench so
  * the captured plans match what the bench executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.queries.Battery.compiler(spark, dir)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      graft.pipeline.ScratchCache.drain()
    }
    spark.stop()
  }
}
