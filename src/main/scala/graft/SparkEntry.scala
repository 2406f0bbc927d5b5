package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Battery

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All SPARQL-engine entries run over the RDF-mapped testdata (FIXTURES.md §6)
  * through the algebra compiler; pipeline entries run directly on the parquet
  * tables. Oracle SQL is DuckDB dialect.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Battery.queries("q_agg_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Battery.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Battery.oracleSql
}
