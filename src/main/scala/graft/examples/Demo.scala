package graft.examples

import org.apache.spark.sql.SparkSession
import graft.GraftEngine

/** End-to-end example: load the testdata as RDF, run SPARQL text queries.
  * Usage: runMain graft.examples.Demo [sfDir] ["SPARQL query"]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = GraftEngine.forTestData(spark, dir)

    if (args.length > 1) {
      eng.query(args(1)).show(20, truncate = false)
    } else {
      println("== top nations by customer balance ==")
      eng.query("""
        PREFIX c: <urn:p:customer:>
        SELECT ?nation (COUNT(*) AS ?n) (SUM(?bal) AS ?total) WHERE {
          ?cust c:c_acctbal ?bal ; <urn:fk:nation> ?nt .
          ?nt <urn:p:nation:n_name> ?nation .
        } GROUP BY ?nation ORDER BY DESC(?total) LIMIT 5""").show(truncate = false)

      println("== ASK / CONSTRUCT ==")
      eng.query("ASK { ?s <urn:p:customer:c_name> ?n }").show()
      eng.query("""CONSTRUCT { ?r <urn:ex:label> ?nm }
                   WHERE { ?r <urn:p:region:r_name> ?nm }""").show(truncate = false)

      println("== transitive fk closure from one order ==")
      eng.query("""SELECT ?node WHERE {
        <urn:t:orders:1> (<urn:fk:customer>|<urn:fk:nation>|<urn:fk:region>)+ ?node
      }""").show(truncate = false)

      println("== explain ==")
      println(eng.explain(
        """SELECT ?nm WHERE { ?c <urn:p:customer:c_name> ?nm .
          |  FILTER(STRSTARTS(?nm, "Customer")) } LIMIT 5""".stripMargin)
        .linesIterator.take(25).mkString("\n"))
    }
    spark.stop()
  }
}
