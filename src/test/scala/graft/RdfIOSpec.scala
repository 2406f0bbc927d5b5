package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.{RdfIO, SparqlResults}
import graft.engine._

class RdfIOSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark

  val nt =
    """# a comment
      |<http://ex.org/s1> <http://ex.org/name> "alice" .
      |<http://ex.org/s1> <http://ex.org/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
      |<http://ex.org/s2> <http://ex.org/name> "bob\njr" .
      |_:b1 <http://ex.org/name> "blank"@en .
      |<http://ex.org/s1> <http://ex.org/knows> <http://ex.org/s2> .
      |""".stripMargin

  test("n-triples round trip: parse, encode, query, serialize") {
    val f = java.io.File.createTempFile("graft", ".nt")
    java.nio.file.Files.writeString(f.toPath, nt)
    val store = RdfIO.loadNTriples(spark, f.getAbsolutePath)
    assert(store.quads.count() == 5)
    // query it
    val eng = new GraftEngine(store)
    val df = eng.query(
      """SELECT ?n WHERE { ?s <http://ex.org/name> ?n . FILTER(!isBlank(?s)) }""")
    val names = df.collect().map(r => r.getStruct(0).getString(1)).toSet
    assert(names == Set("alice", "bob\njr"))
    // serialize back
    val out = "/tmp/graft_ntout"
    RdfIO.dumpNQuads(store, out)
    val lines = spark.read.textFile(out).collect()
    assert(lines.length == 5)
    assert(lines.forall(_.endsWith(" .")))
    val reparsed = lines.flatMap(RdfIO.parseLine)
    assert(reparsed.count(_._3 == Term.langStr("blank", "en")) == 1)
  }

  test("turtle subset parses the reference example shapes") {
    val ttl =
      """@prefix geo: <http://www.w3.org/2003/01/geo/wgs84_pos#> .
        |@prefix gml: <http://www.opengis.net/gml/> .
        |<http://dbpedia.org/resource/Acton,_California>
        |    a gml:_Feature ;
        |    geo:lat  "34.47277777777778"^^<http://www.w3.org/2001/XMLSchema#float> ;
        |    geo:long "-118.1836111111111"^^<http://www.w3.org/2001/XMLSchema#float> ;
        |    <http://ex.org/point> "34.47 -118.18"@en .
        |<http://ex.org/other> geo:lat 12.5 ; geo:long -3 .
        |""".stripMargin
    val triples = RdfIO.parseTurtle(ttl)
    assert(triples.size == 6)
    val store = RdfIO.loadTurtle(spark, ttl)
    val eng = new GraftEngine(store)
    // the reference README geo query shape (README.md:30-43)
    val df = eng.query(
      """PREFIX geo: <http://www.w3.org/2003/01/geo/wgs84_pos#>
        |SELECT ?s WHERE {
        |  ?s geo:lat ?lat ; geo:long ?long ;
        |  FILTER(?long < -110)
        |  FILTER(?lat >= 30.0)
        |  FILTER(?lat <= 35.0)
        |} ORDER BY ?s""".stripMargin)
    val got = df.collect().map(_.getStruct(0).getString(1)).toSeq
    assert(got == Seq("http://dbpedia.org/resource/Acton,_California"))
  }

  test("sparql results JSON/XML/TSV round-trip") {
    val sf = "/root/testdata/sf0.001"
    val eng = GraftEngine.forTestData(spark, sf)
    val df = eng.query(
      """SELECT ?nm ?bal WHERE {
        |  ?c <urn:p:customer:c_name> ?nm ; <urn:p:customer:c_acctbal> ?bal .
        |} ORDER BY ?nm LIMIT 5""".stripMargin)
    val json = SparqlResults.toJson(df)
    val (jv, jr) = SparqlResults.parseJson(json)
    assert(jv == Seq("nm", "bal") && jr.size == 5)
    assert(jr.head("nm").lex.startsWith("Customer#"))

    val xml = SparqlResults.toXml(df)
    val (xv, xr) = SparqlResults.parseXml(xml)
    assert(xv == Seq("nm", "bal") && xr.size == 5)
    assert(xr.map(_("nm")) == jr.map(_("nm")))

    val tsv = SparqlResults.toTsv(df)
    val (tv, tr) = SparqlResults.parseTsv(tsv)
    assert(tv == Seq("nm", "bal") && tr.size == 5)
    assert(tr.map(_("nm")) == jr.map(_("nm")))
    assert(tr.head("bal").asInstanceOf[Lit].datatype == Term.xsdDouble)
  }
}
