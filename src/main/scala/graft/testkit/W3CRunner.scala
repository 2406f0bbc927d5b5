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
  *
  * Why modeled and not imported: the runner speaks the real manifest.ttl
  * format on purpose, but the actual `w3c/rdf-tests` checkout is not
  * available in this environment — the reference repo's `rdf-tests/` and
  * `rdf-tests-12/` submodules are EMPTY (verified: zero files), and the
  * build has no network egress to clone them. Dropping the real sparql11
  * query-evaluation directories under `src/test/resources/w3c/` is expected
  * to work as-is whenever a checkout is available.
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

  /** The differential's second engine: build the [[RefInterp.Dataset]] for a
    * test case (same file→graph conventions as [[buildDataset]]). */
  private def interpDataset(tc: TestCase): RefInterp.Dataset = {
    val defG: Term = Iri("urn:g:w3c-default")
    val quads: Seq[(Term, Term, Term, Term)] =
      tc.data.toSeq.flatMap(f => RdfIO.parseTurtle(read(f)).map {
        case (s, p, o) => (s, p, o, defG) }) ++
      tc.graphData.flatMap(f => RdfIO.parseTurtle(read(f)).map {
        case (s, p, o) => (s, p, o, Iri(f.toURI.toString): Term) })
    val ds = RefInterp.Dataset.fromQuads(quads,
      if (tc.graphData.isEmpty) quads.map(_._4).toSet else Set(defG))
    if (tc.graphData.isEmpty) ds // store default: every graph default AND named
    else ds.copy(namedNames = Some(tc.graphData.map(f => Iri(f.toURI.toString): Term).toSet))
  }

  /** Whole-engine differential (the reference's two-evaluator device,
    * SPARQLTestSuite.swift:19-20): run [[RefInterp]] on the same test and
    * compare against the Spark engine's rows — multiset modulo blank-node
    * bijection for SELECT, boolean for ASK, graph isomorphism for CONSTRUCT.
    * None = agreement (or an out-of-scope query shape); Some = divergence. */
  private def diffInterp(tc: TestCase, pq: graft.parser.ParsedQuery,
      ctx: graft.engine.ExprEval.Ctx, service: Option[graft.engine.ServiceClient],
      engineRows: => Seq[Map[String, Term]], engineAsk: => Option[Boolean],
      engineQuads: => Option[Seq[(Term, Term, Term)]],
      lax: Boolean): Option[String] = {
    def nondet(a: graft.algebra.Algebra): Boolean = {
      import graft.algebra._
      def exprs(x: Algebra): Seq[Expr] = x match {
        case AFilter(e, c) => e +: exprs(c)
        case AExtend(c, _, e) => e +: exprs(c)
        case ALeftJoin(l, r, e) => e.toSeq ++ exprs(l) ++ exprs(r)
        case AOrderBy(c, ks) => ks.map(_.e) ++ exprs(c)
        case AGroup(c, _, as) => as.flatMap(_.e) ++ exprs(c)
        case AWindow(c, fs) => fs.flatMap(_.e) ++ exprs(c)
        case AJoin(l, r) => exprs(l) ++ exprs(r)
        case AUnion(l, r) => exprs(l) ++ exprs(r)
        case AMinus(l, r) => exprs(l) ++ exprs(r)
        case AProject(c, _) => exprs(c)
        case ADistinct(c) => exprs(c)
        case AReduced(c) => exprs(c)
        case ASlice(c, _, _) => exprs(c)
        case AService(_, c, _) => exprs(c)
        case _ => Seq.empty
      }
      // recurse into EExists patterns too: RAND()/BNODE() inside an EXISTS
      // makes the whole query diff-unstable just the same
      def exprNondet(e: Expr): Boolean = e match {
        case EExists(p, _) => nondet(p)
        case ECall(fn, as) =>
          Seq("rand", "uuid", "struuid", "bnode").contains(fn) ||
            as.exists(exprNondet)
        case _ => false
      }
      exprs(a).exists(exprNondet)
    }
    // an unordered LIMIT — or OFFSET, which also picks an arbitrary subset —
    // legitimately differs per engine; slices hide at ANY depth (subqueries)
    def unstableSlice(a: graft.algebra.Algebra): Boolean = a match {
      case graft.algebra.ASlice(c, off, lim) =>
        ((lim >= 0 || off > 0) && !stableUnder(c)) || unstableSlice(c)
      case other => other.productIterator.exists {
        case c: graft.algebra.Algebra => unstableSlice(c)
        case _ => false
      }
    }
    def stableUnder(a: graft.algebra.Algebra): Boolean = a match {
      case graft.algebra.AOrderBy(_, _) => true
      case graft.algebra.AProject(c, _) => stableUnder(c)
      case graft.algebra.ADistinct(c) => stableUnder(c)
      case graft.algebra.AReduced(c) => stableUnder(c)
      case _ => false
    }
    if (nondet(pq.algebra) || unstableSlice(pq.algebra)) return None
    // REDUCED legally returns ANY multiplicity between DISTINCT and the full
    // bag — the two engines may disagree on cardinality even when the
    // manifest (comparing against one concrete engine output) is not lax
    def hasReduced(a: graft.algebra.Algebra): Boolean =
      a.productIterator.exists {
        case graft.algebra.AReduced(_) => true
        case c: graft.algebra.Algebra => hasReduced(c)
        case _ => false
      } || a.isInstanceOf[graft.algebra.AReduced]
    val laxAll = lax || hasReduced(pq.algebra)
    val ds = interpDataset(tc)
    try pq.form match {
      case "ask" =>
        val got = RefInterp.ask(pq, ds, ctx, service)
        engineAsk.flatMap(e => if (e == got) None
          else Some(s"${tc.name}: DIFF ask engine=$e interp=$got"))
      case "construct" =>
        val got = RefInterp.construct(pq, ds, ctx, service).toSeq
        engineQuads.flatMap(e =>
          if (Isomorphism.isomorphic(e, got)) None
          else Some(s"${tc.name}: DIFF construct graphs differ\n  engine: " +
            s"${e.sortBy(_.toString).mkString("; ")}\n  interp: ${got.sortBy(_.toString).mkString("; ")}"))
      case "select" =>
        val got = RefInterp.select(pq, ds, ctx, service)
        val (a, b) = if (laxAll) (engineRows.distinct, got.distinct) else (engineRows, got)
        if (Isomorphism.solutionsEqual(a, b)) None
        else Some(s"${tc.name}: DIFF select engine≠interp\n  engine: ${fmt(a)}\n  interp: ${fmt(b)}")
      case _ => None // describe: result set is store-dependent; out of diff scope
    } catch {
      case _: UnsupportedOperationException => None // declared out-of-scope shape
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
    val svc: Option[graft.engine.ServiceClient] = Some(
      new graft.engine.LocalServiceClient(Map("urn:svc:self" -> store)))
    val eng = new GraftEngine(store, serviceClient = svc)
    val queryText = read(tc.query)
    val pq = graft.parser.SparqlParser.parse(queryText)
    def diff(rows: => Seq[Map[String, Term]], askB: => Option[Boolean],
        quads: => Option[Seq[(Term, Term, Term)]]): Option[String] =
      diffInterp(tc, pq, eng.compiler.ctx, svc, rows, askB, quads,
        tc.laxCardinality)
    val resultFile = tc.result.get
    if (resultFile.getName.endsWith(".ttl")) { // CONSTRUCT: graph isomorphism
      val got: Seq[(Term, Term, Term)] = eng.constructQuads(queryText)
        .collect().toSeq.map(r => (TermRow.fromRow(r.getStruct(0)),
          TermRow.fromRow(r.getStruct(1)), TermRow.fromRow(r.getStruct(2))))
      val want = RdfIO.parseTurtle(read(resultFile))
      return if (Isomorphism.isomorphic(got, want))
        diff(Seq.empty, None, Some(got))
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
      return if (Isomorphism.solutionsEqual(gotRows, expRows))
        diff(gotRows, None, None)
      else Some(s"${tc.name}: TSV results differ\n  got:  ${fmt(gotRows)}\n" +
        s"  want: ${fmt(expRows)}")
    }
    if (expectedText.contains("<boolean>")) { // ASK
      val want = expectedText.contains("<boolean>true</boolean>")
      val got = df.collect().head.getBoolean(0)
      if (got == want) diff(Seq.empty, Some(got), None)
      else Some(s"${tc.name}: ASK got $got, want $want")
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
      val ordered = topOrdered(pq.algebra)
      val ok =
        if (tc.laxCardinality) // REDUCED: any multiplicity, same solution set
          Isomorphism.solutionsEqual(gotRows.distinct, expRows.distinct)
        else if (ordered) gotRows == expRows // sort tests are authored bnode-free
        else Isomorphism.solutionsEqual(gotRows, expRows)
      if (ok) diff(gotRows, None, None)
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
