package graft.testkit

import org.apache.spark.sql.SparkSession
import graft.model._
import graft.sources.{RdfIO, SparqlResults}
import graft.GraftEngine

/** Manifest-driven SPARQL evaluation-test runner (reference:
  * kasei/kineo `Sources/Kineo/W3C/SPARQLTestSuite.swift:11-501`).
  *
  * Same self-hosting idea as the reference: the manifest is RDF, so the engine
  * stack reads it — `manifest.ttl` parses with our Turtle parser, the
  * `mf:entries` collection walks through rdf:first/rest, each entry's
  * qt:query/qt:data/mf:result resolve as relative IRIs against the manifest
  * location. Results compare as solution multisets modulo blank-node bijection
  * ([[Isomorphism.solutionsEqual]]), booleans directly.
  *
  * The W3C corpus is vendored as mini-manifests under
  * `src/test/resources/w3c/` (authored in the structure of the public
  * sparql11 test suite — aggregates, negation, property paths, optional).
  */
object W3CRunner {
  val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  val QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
  val RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  final case class TestCase(name: String, query: java.io.File,
      data: Option[java.io.File], result: Option[java.io.File],
      /** qt:graphData: named graphs, named by their file IRI (W3C convention). */
      graphData: Seq[java.io.File] = Nil,
      /** `eval` (QueryEvaluationTest), `syntax-pos` (PositiveSyntaxTest11 —
        * must parse), or `syntax-neg` (NegativeSyntaxTest11 — must be
        * rejected). Syntax tests carry no data/result; their mf:action is the
        * query file itself (W3C sparql11 manifest convention). */
      kind: String = "eval",
      /** mf:resultCardinality mf:LaxCardinality (the W3C REDUCED convention):
        * compare solutions ignoring multiplicity — REDUCED may legally return
        * any cardinality between DISTINCT and the full bag. */
      laxCardinality: Boolean = false)

  private def read(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  /** Parse `dir/manifest.ttl` into test cases. */
  def loadManifest(dir: java.io.File): Seq[TestCase] = {
    val triples = RdfIO.parseTurtle(read(new java.io.File(dir, "manifest.ttl")),
      dir.toURI.toString)
    val bySubj = triples.groupBy(_._1)
    def obj(s: Term, p: String): Option[Term] =
      bySubj.getOrElse(s, Nil).collectFirst { case (_, Iri(pp), o) if pp == p => o }
    def fileOf(t: Term): java.io.File = t match {
      case Iri(v) => new java.io.File(new java.net.URI(v))
      case other => throw new IllegalArgumentException(s"not a file IRI: $other")
    }
    val entriesHead = triples.collectFirst {
      case (_, Iri(p), o) if p == MF + "entries" => o
    }.getOrElse(throw new IllegalArgumentException(s"no mf:entries in $dir"))
    def walk(n: Term): Seq[Term] = n match {
      case Iri(v) if v == RDFNS + "nil" => Nil
      case _ => obj(n, RDFNS + "first").toSeq ++
        obj(n, RDFNS + "rest").toSeq.flatMap(walk)
    }
    walk(entriesHead).map { e =>
      val name = obj(e, MF + "name").map(_.lex).getOrElse(e.lex)
      val kind = obj(e, RDFNS + "type").collect {
        case Iri(t) if t == MF + "PositiveSyntaxTest11" => "syntax-pos"
        case Iri(t) if t == MF + "NegativeSyntaxTest11" => "syntax-neg"
      }.getOrElse("eval")
      val action = obj(e, MF + "action")
        .getOrElse(throw new IllegalArgumentException(s"$name: no mf:action"))
      if (kind != "eval") // syntax test: the action IS the query file
        TestCase(name, fileOf(action), None, None, Nil, kind)
      else {
        val graphData = bySubj.getOrElse(action, Nil).collect {
          case (_, Iri(p), o) if p == QT + "graphData" => fileOf(o)
        }
        val lax = obj(e, MF + "resultCardinality").exists {
          case Iri(v) => v == MF + "LaxCardinality"
          case _ => false
        }
        TestCase(name,
          fileOf(obj(action, QT + "query").get),
          obj(action, QT + "data").map(fileOf),
          Some(fileOf(obj(e, MF + "result").get)),
          graphData, "eval", lax)
      }
    }
  }

  /** Run one test; None = pass, Some(message) = failure. */
  def run(spark: SparkSession, tc: TestCase): Option[String] = {
    if (tc.kind == "syntax-pos")
      return try { graft.parser.SparqlParser.parse(read(tc.query)); None }
        catch { case e: Exception =>
          Some(s"${tc.name}: positive syntax test rejected: ${e.getMessage}") }
    if (tc.kind == "syntax-neg")
      return try {
        graft.parser.SparqlParser.parse(read(tc.query))
        Some(s"${tc.name}: negative syntax test parsed — must be rejected")
      } catch { case _: Exception => None }
    val store = buildDataset(spark, tc)
    // <urn:svc:self> federates back to the test dataset itself — lets
    // manifests exercise SERVICE without a network endpoint (the service
    // area; other areas never reference the endpoint, so this is inert)
    val eng = new GraftEngine(store, serviceClient = Some(
      new graft.engine.LocalServiceClient(Map("urn:svc:self" -> store))))
    val queryText = read(tc.query)
    val resultFile = tc.result.get
    if (resultFile.getName.endsWith(".ttl")) { // CONSTRUCT: graph isomorphism
      val got: Seq[(Term, Term, Term)] = eng.constructQuads(queryText)
        .collect().toSeq.map(r => (TermRow.fromRow(r.getStruct(0)),
          TermRow.fromRow(r.getStruct(1)), TermRow.fromRow(r.getStruct(2))))
      val want = RdfIO.parseTurtle(read(resultFile))
      return if (Isomorphism.isomorphic(got, want)) None
      else Some(s"${tc.name}: graphs differ\n  got:  ${got.sortBy(_.toString).mkString("; ")}\n" +
        s"  want: ${want.sortBy(_.toString).mkString("; ")}")
    }
    val df = eng.query(queryText)
    val expectedText = read(resultFile)

    if (resultFile.getName.endsWith(".tsv")) {
      // csv-tsv-res area: expected results in SPARQL-TSV — compare through
      // BOTH directions of the TSV codec (serialize the engine result, parse
      // it back, compare against the parsed expectation as solution multisets)
      val (_, expRows) = SparqlResults.parseTsv(expectedText)
      val (_, gotRows) = SparqlResults.parseTsv(SparqlResults.toTsv(df))
      return if (Isomorphism.solutionsEqual(gotRows, expRows)) None
      else Some(s"${tc.name}: TSV results differ\n  got:  ${fmt(gotRows)}\n" +
        s"  want: ${fmt(expRows)}")
    }
    if (expectedText.contains("<boolean>")) { // ASK
      val want = expectedText.contains("<boolean>true</boolean>")
      val got = df.collect().head.getBoolean(0)
      if (got == want) None else Some(s"${tc.name}: ASK got $got, want $want")
    } else {
      val (_, expRows) = SparqlResults.parseXml(expectedText)
      val cols = df.columns
      val gotRows: Seq[Map[String, Term]] = df.collect().toSeq.map { r =>
        cols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(i)) None
          else Option(TermRow.fromRow(r.getStruct(i))).map(c -> _)
        }.toMap
      }
      // a TOP-LEVEL ORDER BY makes the result a SEQUENCE: compare positionally.
      // (An ORDER BY inside a subselect orders only the subquery — walk the
      // modifier stack of the parsed algebra, don't grep the text.)
      def topOrdered(a: graft.algebra.Algebra): Boolean = a match {
        case graft.algebra.AOrderBy(_, _) => true
        case graft.algebra.ASlice(c, _, _) => topOrdered(c)
        case graft.algebra.ADistinct(c) => topOrdered(c)
        case graft.algebra.AReduced(c) => topOrdered(c)
        case graft.algebra.AProject(c, _) => topOrdered(c)
        case _ => false
      }
      val ordered = topOrdered(graft.parser.SparqlParser.parse(queryText).algebra)
      val ok =
        if (tc.laxCardinality) // REDUCED: any multiplicity, same solution set
          Isomorphism.solutionsEqual(gotRows.distinct, expRows.distinct)
        else if (ordered) gotRows == expRows // sort tests are authored bnode-free
        else Isomorphism.solutionsEqual(gotRows, expRows)
      if (ok) None
      else Some(s"${tc.name}: results differ (${if (ordered) "ordered" else "multiset"})\n" +
        s"  got:  ${fmt(gotRows)}\n  want: ${fmt(expRows)}")
    }
  }

  /** Build the test dataset: qt:data → the default graph, each qt:graphData →
    * a named graph whose name is the file IRI (W3C convention). */
  private def buildDataset(spark: SparkSession,
      tc: TestCase): graft.store.RdfStore = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq("s", "p", "o", "g").map(n =>
      StructField(n, TermRow.schema, nullable = true)))
    def quadsOf(f: java.io.File, g: Term): Seq[Row] =
      RdfIO.parseTurtle(read(f)).map { case (s, p, o) =>
        Row(TermRow.toRow(s), TermRow.toRow(p), TermRow.toRow(o), TermRow.toRow(g))
      }
    val defG = Iri("urn:g:w3c-default")
    val rows = tc.data.toSeq.flatMap(quadsOf(_, defG)) ++
      tc.graphData.flatMap(f => quadsOf(f, Iri(f.toURI.toString)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val st = graft.store.StoreEncoder.encode(df, graft.model.IriScheme.default)
    if (tc.graphData.isEmpty) st
    else st.copy(
      defaultGraphs = st.idOf(defG).toSeq,
      namedGraphs = Some(tc.graphData.flatMap(f => st.idOf(Iri(f.toURI.toString)))))
  }

  /** Run every test of a manifest directory; returns failures. */
  def runDir(spark: SparkSession, dir: String): Seq[String] = {
    val cases = loadManifest(new java.io.File(dir))
    require(cases.nonEmpty, s"empty manifest: $dir")
    cases.flatMap(tc =>
      try run(spark, tc)
      catch { case e: Exception => Some(s"${tc.name}: ${e.getClass.getSimpleName} ${e.getMessage}") })
  }

  private def fmt(rows: Seq[Map[String, Term]]): String =
    rows.map(m => m.toSeq.sortBy(_._1).map { case (k, v) => s"?$k=${v}" }
      .mkString("{", ", ", "}")).sorted.mkString(" | ")
}
