package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream analytics (batch shapes of the streaming operators; the streaming
  * variants live in [[graft.streaming.StreamOps]]).
  */
object EventsOps {

  /** events.parquet stores TIMESTAMP(NANOS); read via nanosAsLong + convert. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }

  /** Tumbling 5-minute windows per event type (Spark-idiomatic window() fn). */
  def window5m(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("total"))

  /** Sessionization: per-user session count with a 30-minute inactivity gap
    * (batch analogue of mapGroupsWithState sessionization).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    events(spark, dir)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** JSON property extraction (props is a JSON string). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(sum(regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")).as("sum_k"),
        count(lit(1)).as("n"))
}
