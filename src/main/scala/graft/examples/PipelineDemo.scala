package graft.examples

import org.apache.spark.sql.SparkSession

/** End-to-end example of the training-data pipeline surface: quality
  * filtering, near-dup detection, the chunk→dedup→pack chain, importance
  * weights, and tokenizer-training merges over the documents table.
  * Usage: runMain graft.examples.PipelineDemo [sfDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline._

    println("== composite quality filter (C4/Gopher-style; one scan, zero shuffles) ==")
    TextStats.qualityFilter(spark, dir).groupBy("reason").count().show()

    println("== MinHash-LSH near-duplicate pairs ==")
    Dedup.minhashLsh(spark, dir).show(5, truncate = false)

    println("== chunk -> dedup-by-hash -> pack (one scan + two exchanges) ==")
    Curation.chunkPack(spark, dir).show(5, truncate = false)

    println("== DSIR importance weights vs target source 'src0' ==")
    Curation.dsirWeights(spark, dir).orderBy(org.apache.spark.sql.functions
      .col("dsir_micro").desc).show(5)

    println("== BPE merge learning (tokenizer training) ==")
    Tokenizer.bpeMerges(spark, dir).show()

    println("== per-source distinct-token cardinality (KMV sketch vs exact) ==")
    TextStats.kmvDistinct(spark, dir).show(5)

    spark.stop()
  }
}
