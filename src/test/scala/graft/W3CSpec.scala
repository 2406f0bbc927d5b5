package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.testkit.W3CRunner

/** W3C-style conformance: manifest-driven evaluation tests over the vendored
  * mini-corpus (aggregates, negation, property paths, optional) — the runner
  * reads each manifest.ttl with the engine's own Turtle parser and compares
  * results modulo blank-node bijection (reference harness:
  * kasei/kineo `Sources/Kineo/W3C/SPARQLTestSuite.swift:11-501`).
  */
class W3CSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark
  val root = "src/test/resources/w3c"

  private def runArea(area: String): Unit = {
    val failures = W3CRunner.runDir(spark, s"$root/$area")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("w3c: aggregates manifest") { runArea("aggregates") }
  test("w3c: negation manifest") { runArea("negation") }
  test("w3c: property-path manifest") { runArea("property-path") }
  test("w3c: optional manifest") { runArea("optional") }
  test("w3c: functions manifest") { runArea("functions") }
  test("w3c: construct manifest") { runArea("construct") }
  test("w3c: sort manifest (ordered compare)") { runArea("sort") }
  test("w3c: subquery manifest") { runArea("subquery") }
  test("w3c: graph/dataset manifest") { runArea("graph") }
  test("w3c: open-world manifest") { runArea("open-world") }
  test("w3c: type-promotion manifest") { runArea("type-promotion") }
  test("w3c: cast manifest") { runArea("cast") }
  test("w3c: bnode-coreference manifest") { runArea("bnode-coreference") }
  test("w3c: i18n manifest") { runArea("i18n") }
  test("w3c: syntax manifest (positive + negative parse-only)") { runArea("syntax-query") }
  test("w3c: solution-seq manifest (distinct/reduced/slice, ordered)") { runArea("solution-seq") }
  test("w3c: bind manifest") { runArea("bind") }
  test("w3c: values manifest") { runArea("values") }
  test("w3c: exists manifest") { runArea("exists") }
  test("w3c: projexpr manifest (SELECT expressions)") { runArea("projexpr") }
  test("w3c: grouping manifest") { runArea("grouping") }
  test("w3c: regex manifest") { runArea("regex") }
  test("w3c: boolean-effective-value manifest") { runArea("bev") }
  test("w3c: bound manifest") { runArea("bound") }
  test("w3c: ask manifest") { runArea("ask") }
  test("w3c: expr-equals manifest") { runArea("expr-equals") }
  test("w3c: triple-match manifest") { runArea("triple-match") }
  test("w3c: algebra manifest (OPTIONAL/FILTER scoping)") { runArea("algebra") }
  test("w3c: expr-builtin manifest (LANG/DATATYPE/isIRI family)") { runArea("expr-builtin") }
  test("w3c: csv-tsv-res manifest (TSV result round-trip)") { runArea("csv-tsv-res") }
  test("w3c: basic manifest (term identity, lexical preservation)") { runArea("basic") }
  test("w3c: dataset manifest (default/named separation)") { runArea("dataset") }
  test("w3c: distinct manifest (term-level DISTINCT)") { runArea("distinct") }
  test("w3c: service manifest (in-process federation)") { runArea("service") }
  test("w3c: expr-ops manifest (arithmetic/comparison operators)") { runArea("expr-ops") }
  test("w3c: reduced manifest (LaxCardinality compare)") { runArea("reduced") }
  test("w3c: aggregates-edge manifest (SUM error poisoning, DISTINCT, default separator, COUNT(*) vs COUNT(?v), GROUP BY expression keys)") { runArea("aggregates-edge") }
  test("w3c: expr-edge manifest (builtin edge cases: STRBEFORE/AFTER lang rules, langMatches ranges, ROUND ties, IN, sameTerm, COALESCE, CONCAT lang, TZ, argument-compat errors)") { runArea("expr-edge") }

  test("algebra→SPARQL-text round-trip preserves results on the whole corpus", Slow) {
    // the HTTP SERVICE client ships patterns as AlgebraText-serialized SPARQL:
    // for every vendored SELECT test, re-serializing the parsed algebra and
    // re-running it must produce the same solution multiset
    import graft.parser.{AlgebraText, SparqlParser}
    import graft.engine.Rewriter
    import graft.model.TermRow
    val areas = Seq("aggregates", "negation", "property-path", "optional",
      "functions", "sort", "subquery", "open-world", "type-promotion", "cast",
      "bnode-coreference", "i18n", "bind", "values", "exists", "projexpr",
      "grouping", "regex", "bev", "bound", "expr-equals", "triple-match",
      "algebra", "expr-builtin", "basic", "distinct", "expr-ops", "reduced",
      "expr-edge", "aggregates-edge")
    var checked = 0
    for (area <- areas; tc <- W3CRunner.loadManifest(new java.io.File(s"$root/$area"))) {
      val q = new String(java.nio.file.Files.readAllBytes(tc.query.toPath), "UTF-8")
      val pq = SparqlParser.parse(q)
      if (pq.form == "select") {
        val data = new String(java.nio.file.Files.readAllBytes(tc.data.get.toPath), "UTF-8")
        val store = graft.sources.RdfIO.loadTurtle(spark, data, graph = "urn:g:w3c")
        val eng = new GraftEngine(store)
        def rows(df: org.apache.spark.sql.DataFrame): Seq[Map[String, graft.model.Term]] = {
          val cols = df.columns
          df.collect().toSeq.map(r => cols.zipWithIndex.flatMap { case (c, i) =>
            if (r.isNullAt(i)) None
            else Option(TermRow.fromRow(r.getStruct(i))).map(c -> _)
          }.toMap)
        }
        val direct = rows(eng.query(q))
        val shipped = AlgebraText.selectQuery(pq.algebra, Nil)
        val viaText = rows(eng.query(shipped))
        assert(graft.testkit.Isomorphism.solutionsEqual(
          direct.map(_.filter(kv => pq.projection.contains(kv._1))),
          viaText.map(_.filter(kv => pq.projection.contains(kv._1)))),
          s"${tc.name}: round-trip through AlgebraText changed results\n  query: $shipped")
        checked += 1
      }
    }
    assert(checked >= 25, s"only $checked SELECT tests round-tripped")
  }

  test("w3c: manifest loader finds every vendored test") {
    val areas = Seq("aggregates", "negation", "property-path", "optional", "functions",
      "construct", "sort", "subquery", "graph", "open-world", "type-promotion",
      "cast", "bnode-coreference", "i18n", "syntax-query", "solution-seq",
      "bind", "values", "exists", "projexpr",
      "grouping", "regex", "bev", "bound", "ask", "expr-equals", "triple-match",
      "algebra", "expr-builtin", "csv-tsv-res", "basic", "dataset", "distinct", "service",
      "expr-ops", "reduced", "expr-edge", "aggregates-edge")
    val cases = areas.flatMap(a => W3CRunner.loadManifest(new java.io.File(s"$root/$a")))
    assert(cases.size == 369, s"expected 369 vendored tests, found ${cases.size}")
    val syntax = cases.count(_.kind != "eval")
    assert(syntax == 43, s"expected 43 syntax (parse-only) tests, found $syntax")
  }
}
