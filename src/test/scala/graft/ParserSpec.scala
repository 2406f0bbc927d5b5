package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algebra._
import graft.engine.ServiceClient
import graft.model._

class ParserSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark
  val sf = "/root/testdata/sf0.001"
  lazy val eng = GraftEngine.forTestData(spark, sf)

  val prolog =
    """PREFIX c: <urn:p:customer:>
      |PREFIX o: <urn:p:orders:>
      |PREFIX n: <urn:p:nation:>
      |PREFIX l: <urn:p:lineitem:>
      |PREFIX fk: <urn:fk:>
      |""".stripMargin

  def lex(r: org.apache.spark.sql.Row, i: Int): String =
    Option(r.getStruct(i)).map(_.getString(1)).orNull

  test("basic select with ; and , shorthand") {
    val df = eng.query(prolog +
      """SELECT ?name ?seg WHERE {
        |  ?c c:c_name ?name ; c:c_mktsegment ?seg .
        |}""".stripMargin)
    assert(df.columns.toSeq == Seq("name", "seg"))
    assert(df.count() == 150)
  }

  test("filter with arithmetic and logical ops") {
    val df = eng.query(prolog +
      """SELECT ?qty ?price WHERE {
        |  ?li l:l_quantity ?qty ; l:l_extendedprice ?price .
        |  FILTER(?qty * 2 > 80 && ?price < 50000)
        |}""".stripMargin)
    val exp = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") * 2 > 80 && col("l_extendedprice") < 50000).count()
    assert(df.count() == exp)
  }

  test("optional with inner filter keeps unmatched rows") {
    val df = eng.query(prolog +
      """SELECT ?name ?tp WHERE {
        |  ?c c:c_name ?name .
        |  OPTIONAL { ?ord fk:customer ?c ; o:o_totalprice ?tp . FILTER(?tp > 250000) }
        |}""".stripMargin)
    val withTp = df.filter(col("tp").isNotNull).count()
    val exp = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 250000).count()
    assert(withTp == exp)
    assert(df.filter(col("tp").isNull).count() > 0)
  }

  test("union + bind + values") {
    val df = eng.query(prolog +
      """SELECT ?nm ?tag WHERE {
        |  { ?n n:n_name ?nm . BIND("nation" AS ?tag) }
        |  UNION
        |  { ?r <urn:p:region:r_name> ?nm . BIND("region" AS ?tag) }
        |}""".stripMargin)
    assert(df.count() == 30)
    val tags = df.collect().map(r => lex(r, 1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(tags == Map("nation" -> 25, "region" -> 5))

    val dfv = eng.query(prolog +
      """SELECT ?rf WHERE {
        |  VALUES ?rf { "A" "N" }
        |  ?lix l:l_returnflag ?rf .
        |}""".stripMargin)
    val exp = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag").isin("A", "N")).count()
    assert(dfv.count() == exp)
  }

  test("aggregates with GROUP BY, HAVING, separator") {
    val df = eng.query(prolog +
      """SELECT ?rf (COUNT(*) AS ?n) (SUM(?qty) AS ?total) WHERE {
        |  ?li l:l_returnflag ?rf ; l:l_quantity ?qty .
        |} GROUP BY ?rf HAVING(COUNT(*) > 1000)""".stripMargin)
    val exp = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"), sum("l_quantity").as("t"))
      .filter(col("n") > 1000).collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2)))).toSet
    assert(df.columns.toSeq == Seq("rf", "n", "total")) // projection order preserved
    val got = df.collect().map(r =>
      (lex(r, 0), lex(r, 1).toLong, math.round(lex(r, 2).toDouble))).toSet
    assert(got == exp)

    val dfc = eng.query(prolog +
      """SELECT (GROUP_CONCAT(DISTINCT ?nm; SEPARATOR="|") AS ?all) WHERE {
        |  ?r <urn:p:region:r_name> ?nm .
        |}""".stripMargin)
    val s = lex(dfc.collect().head, 0)
    assert(s.split('|').length == 5 && s.contains("AFRICA"))
  }

  test("order by desc + limit + offset") {
    val df = eng.query(prolog +
      """SELECT ?ok ?tp WHERE {
        |  ?ord o:o_orderkey ?ok ; o:o_totalprice ?tp .
        |} ORDER BY DESC(?tp) LIMIT 3 OFFSET 2""".stripMargin)
    val exp = spark.read.parquet(s"$sf/orders.parquet")
      .orderBy(col("o_totalprice").desc).select("o_orderkey")
      .collect().map(_.getLong(0)).slice(2, 5).toSeq
    assert(df.collect().map(r => lex(r, 0).toLong).toSeq == exp)
  }

  test("property paths: sequence and plus through the parser") {
    val df = eng.query(prolog +
      """SELECT ?name WHERE {
        |  <urn:t:orders:1> fk:customer/c:c_name ?name .
        |}""".stripMargin)
    assert(df.count() == 1)
    val plus = eng.query(prolog +
      """SELECT ?x WHERE {
        |  <urn:t:orders:1> (fk:customer|fk:nation|fk:region)+ ?x .
        |}""".stripMargin)
    assert(plus.count() == 3)
  }

  test("subquery and EXISTS") {
    val df = eng.query(prolog +
      """SELECT ?name WHERE {
        |  { SELECT ?c WHERE { ?ord fk:customer ?c . } }
        |  ?c c:c_name ?name .
        |  FILTER EXISTS { ?c c:c_acctbal ?bal . FILTER(?bal > 0) }
        |}""".stripMargin)
    // orders per customer with positive balance (multiset via subquery)
    val exp = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet")
        .filter(col("c_acctbal") > 0), col("o_custkey") === col("c_custkey"))
      .count()
    assert(df.count() == exp)
  }

  test("ask, construct, describe forms") {
    assert(eng.query("ASK { ?s <urn:p:customer:c_name> ?n }").first().getBoolean(0))
    assert(!eng.query(
      """ASK { ?s <urn:p:customer:c_name> "NO_SUCH_NAME" }""").first().getBoolean(0))
    val tri = eng.query(prolog +
      """CONSTRUCT { ?r <urn:ex:named> ?nm . }
        |WHERE { ?r <urn:p:region:r_name> ?nm . }""".stripMargin)
    assert(tri.count() == 5)
    assert(tri.columns.toSeq == Seq("subject", "predicate", "object"))
    val desc = eng.query("DESCRIBE <urn:t:customer:7>")
    assert(desc.count() == 6) // 5 columns + 1 fk

    // multi-target: constant list and var list (reference describes a list,
    // SimpleQueryEvaluation.swift:1305-1319)
    val desc2 = eng.query("DESCRIBE <urn:t:customer:7> <urn:t:region:0>")
    assert(desc2.count() == 6 + 2) // region row: r_regionkey, r_name
    val desc3 = eng.query(
      """DESCRIBE ?x ?n WHERE { ?x <urn:p:customer:c_custkey> 7 .
        |?x <urn:fk:nation> ?n }""".stripMargin)
    assert(desc3.count() == 6 + 4) // customer quads + nation's 3 cols + fk
    val descStar = eng.query(
      "DESCRIBE * WHERE { ?x <urn:p:customer:c_custkey> 7 }")
    assert(descStar.count() == 6)
  }

  test("graph clause restricts to one graph") {
    val df = eng.query(
      """SELECT ?s ?o WHERE { GRAPH <urn:g:region> { ?s ?p ?o } }""")
    assert(df.count() == 10) // region: 5 rows x 2 cols
  }

  test("service uses the pluggable client") {
    val client = new ServiceClient {
      def execute(ep: String, pattern: Algebra, vars: Seq[String]): Seq[Map[String, Term]] =
        Seq(Map("ext" -> Term.str("hello")), Map("ext" -> Term.str("world")))
    }
    val e2 = new GraftEngine(eng.store, serviceClient = Some(client))
    val df = e2.query(
      """SELECT ?ext WHERE { SERVICE <http://remote.example/sparql> { ?x <urn:p:any> ?ext } }""")
    assert(df.collect().map(r => lex(r, 0)).sorted.toSeq == Seq("hello", "world"))
  }

  test("FROM restricts the default graph; FROM NAMED restricts GRAPH ?g") {
    // default graph = region only → ?s ?p ?o sees 10 quads
    val df = eng.query(
      """SELECT ?s ?o FROM <urn:g:region> WHERE { ?s ?p ?o }""")
    assert(df.count() == 10)
    // FROM NAMED: GRAPH ?g ranges over the named set only
    val dfn = eng.query(
      """SELECT ?g2 WHERE { GRAPH ?g2 { ?s ?p ?o } }""")
    assert(dfn.select("g2").distinct().count() == 10) // all graphs named by default
    val dfn2 = eng.query(
      """SELECT ?g2 FROM NAMED <urn:g:region> FROM NAMED <urn:g:nation>
        |WHERE { GRAPH ?g2 { ?s ?p ?o } }""".stripMargin)
    val got = dfn2.collect().map(_.getStruct(0).getString(1)).toSet
    assert(got == Set("urn:g:region", "urn:g:nation"))
  }

  test("expression functions through text: strings, casts, conditionals") {
    val df = eng.query(prolog +
      """SELECT ?nm ?u ?keynum ?cls WHERE {
        |  ?c c:c_name ?nm ; c:c_acctbal ?bal .
        |  BIND(UCASE(SUBSTR(?nm, 1, 8)) AS ?u)
        |  BIND(<http://www.w3.org/2001/XMLSchema#integer>(STRAFTER(?nm, "#")) AS ?keynum)
        |  BIND(IF(?bal >= 0, "ok", "neg") AS ?cls)
        |  FILTER(CONTAINS(?nm, "1") || REGEX(?nm, "2$"))
        |}""".stripMargin)
    assert(df.columns.toSeq == Seq("nm", "u", "keynum", "cls"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => lex(r, 1) == "CUSTOMER"))
    assert(rows.forall(r => lex(r, 2) != null))
    assert(rows.forall(r => Set("ok", "neg").contains(lex(r, 3))))
  }

  test("BASE declaration resolves relative IRIs per RFC 3986") {
    import graft.parser.SparqlParser
    import graft.algebra._
    import graft.model.Iri
    val pq = SparqlParser.parse(
      """BASE <http://ex.org/dir/doc>
        |SELECT ?o WHERE { <sibling> <#frag> ?o . <../up> <http://abs.org/p> <> }""".stripMargin)
    val pats = pq.algebra match {
      case AProject(BGP(ps), _) => ps
      case BGP(ps) => ps
      case other => fail(s"unexpected: $other")
    }
    assert(pats(0).s == T(Iri("http://ex.org/dir/sibling")))
    assert(pats(0).p == T(Iri("http://ex.org/dir/doc#frag")))
    assert(pats(1).s == T(Iri("http://ex.org/up")))
    assert(pats(1).p == T(Iri("http://abs.org/p")), "absolute IRIs pass through")
    assert(pats(1).o == T(Iri("http://ex.org/dir/doc")), "<> is the base document")
  }

  // PN_PREFIX may legally be a keyword ("true"/"false"/"EXISTS"); only a bare
  // keyword NOT followed by ':' is the boolean literal / EXISTS form
  // (SPARQL grammar [134] BooleanLiteral vs [140] PNAME_NS)
  test("prefixed names that collide with keywords: true:/false:/EXISTS:") {
    import graft.parser.SparqlParser
    import graft.algebra._
    val pq = SparqlParser.parse(
      """PREFIX true: <urn:fn:>
        |PREFIX false: <urn:fn2:>
        |PREFIX EXISTS: <urn:fn3:>
        |SELECT ?x ?y ?z WHERE {
        |  ?s <urn:p:q> ?o .
        |  BIND(true:f(?o) AS ?x)
        |  BIND(false:g(?o) AS ?y)
        |  BIND(EXISTS:h(?o) AS ?z)
        |}""".stripMargin)
    def exprs(x: Any): Seq[Expr] = x match {
      case e: Expr => e +: e.productIterator.toSeq.flatMap(exprs)
      case s: Seq[_] => s.flatMap(exprs)
      case o: Option[_] => o.toSeq.flatMap(exprs)
      case p: Product => p.productIterator.toSeq.flatMap(exprs)
      case _ => Seq.empty
    }
    val calls = exprs(pq.algebra).collect { case ECall(fn, _) => fn }
    assert(calls.toSet == Set("urn:fn:f", "urn:fn2:g", "urn:fn3:h"), calls.toString)
  }

  test("bare true/false literals and FILTER EXISTS still parse as keywords") {
    import graft.parser.SparqlParser
    import graft.algebra._
    import graft.model.Term
    val pq = SparqlParser.parse(
      """SELECT ?b WHERE {
        |  ?s <urn:p:q> ?o .
        |  BIND(true AS ?b)
        |  FILTER(false || ?o > 1)
        |  FILTER(EXISTS { ?s <urn:p:r> ?o2 })
        |  FILTER(NOT EXISTS { ?s <urn:p:n> ?o3 })
        |}""".stripMargin)
    def exprs(x: Any): Seq[Expr] = x match {
      case e: Expr => e +: e.productIterator.toSeq.flatMap(exprs)
      case s: Seq[_] => s.flatMap(exprs)
      case o: Option[_] => o.toSeq.flatMap(exprs)
      case p: Product => p.productIterator.toSeq.flatMap(exprs)
      case _ => Seq.empty
    }
    val es = exprs(pq.algebra)
    assert(es.contains(EConst(Term.bool(true))), "bare true must be a literal")
    assert(es.contains(EConst(Term.bool(false))), "bare false must be a literal")
    assert(es.collect { case EExists(_, neg) => neg }.sorted == Seq(false, true))
  }

  test("window syntax: RANK/NTILE/frame aggregates parse to AWindow and round-trip through AlgebraText") {
    import graft.parser.{AlgebraText, SparqlParser}
    import graft.algebra._
    // the reference's window extension syntax (QueryPlanner.swift:699-720)
    val pq = SparqlParser.parse(
      """SELECT ?ck ?tp
        |  (RANK() OVER (PARTITION BY ?ck ORDER BY DESC(?tp)) AS ?rk)
        |  (NTILE(4) OVER (ORDER BY ?tp ?ck) AS ?quartile)
        |  (SUM(?tp) OVER (PARTITION BY ?ck ORDER BY ?tp
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ?movsum)
        |  (AVG(?tp) OVER (ORDER BY ?tp ROWS BETWEEN UNBOUNDED AND 1 PRECEDING) AS ?ma)
        |  (GROUP_CONCAT(?ck; SEPARATOR=",") OVER (ORDER BY ?tp
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED) AS ?trail)
        |WHERE { ?o <urn:p:orders:o_custkey> ?ck ; <urn:p:orders:o_totalprice> ?tp }""".stripMargin)
    def windows(a: Algebra): Seq[WinSpec] = a match {
      case AWindow(c, fns) => windows(c) ++ fns
      case AProject(c, _) => windows(c)
      case AExtend(c, _, _) => windows(c)
      case _ => Seq.empty
    }
    val ws = windows(pq.algebra)
    assert(ws.map(_.fn) == Seq("rank", "ntile", "sum", "avg", "group_concat"))
    val rk = ws.find(_.fn == "rank").get
    assert(rk.partBy == Seq("ck") && rk.ordBy == Seq(SortKey(EVar("tp"), asc = false)))
    val nt = ws.find(_.fn == "ntile").get
    assert(nt.arg == 4 && nt.ordBy.map(_.e) == Seq(EVar("tp"), EVar("ck")))
    val mv = ws.find(_.fn == "sum").get
    assert(mv.frame.contains((-2L, 0L)))
    val ma = ws.find(_.fn == "avg").get
    assert(ma.frame.contains((Long.MinValue, -1L)), "bare UNBOUNDED start bound")
    val tr = ws.find(_.fn == "group_concat").get
    assert(tr.sep == "," && tr.frame.contains((0L, Long.MaxValue)),
      "bare UNBOUNDED end bound")
    // serializer round-trip: text → algebra → text → algebra, same windows
    val inner = pq.algebra match { case AProject(c, _) => c; case other => other }
    val text = AlgebraText.selectQuery(inner, Nil)
    val ws2 = windows(SparqlParser.parse(text).algebra)
    assert(ws2.map(w => (w.fn, w.partBy, w.ordBy, w.frame, w.arg, w.sep)) ==
      ws.map(w => (w.fn, w.partBy, w.ordBy, w.frame, w.arg, w.sep)))
    // a plain aggregate projection must NOT be mistaken for a window
    val agg = SparqlParser.parse(
      "SELECT (COUNT(?o) AS ?n) WHERE { ?s <urn:p:q> ?o }")
    assert(windows(agg.algebra).isEmpty)
    // rank family requires ORDER BY inside OVER
    intercept[graft.parser.ParseException] {
      SparqlParser.parse("SELECT (RANK() OVER (PARTITION BY ?s) AS ?r) WHERE { ?s <urn:p:q> ?o }")
    }
  }

  test("GROUP_CONCAT separators with quotes/backslashes/controls survive AlgebraText round-trips") {
    import graft.parser.{AlgebraText, SparqlParser}
    import graft.algebra._
    for (sep <- Seq("\"", "\\", "a\"b\\c", "\n", "\t\r", "', '")) {
      // aggregate form
      val agg = AGroup(BGP(Seq(QuadPattern(V("s"), T(Iri("urn:p:q")), V("o")))),
        Seq("s"), Seq(AggSpec("all", "group_concat", Some(EVar("o")), sep = sep)))
      val aggBack = SparqlParser.parse(AlgebraText.selectQuery(agg, Nil)).algebra
      def aggSeps(a: Algebra): Seq[String] = a match {
        case AGroup(_, _, as) => as.map(_.sep)
        case AProject(c, _) => aggSeps(c); case AExtend(c, _, _) => aggSeps(c)
        case _ => Seq.empty
      }
      assert(aggSeps(aggBack) == Seq(sep), s"agg separator mangled: ${sep.toSeq}")
      // window form
      val win = AWindow(BGP(Seq(QuadPattern(V("s"), T(Iri("urn:p:q")), V("o")))),
        Seq(WinSpec("trail", "group_concat", Some(EVar("o")), partBy = Seq.empty,
          ordBy = Seq(SortKey(EVar("o"), asc = true)), sep = sep)))
      def winSeps(a: Algebra): Seq[String] = a match {
        case AWindow(_, fs) => fs.map(_.sep)
        case AProject(c, _) => winSeps(c); case AExtend(c, _, _) => winSeps(c)
        case _ => Seq.empty
      }
      val winBack = SparqlParser.parse(AlgebraText.selectQuery(win, Nil)).algebra
      assert(winSeps(winBack) == Seq(sep), s"window separator mangled: ${sep.toSeq}")
    }
  }
}
