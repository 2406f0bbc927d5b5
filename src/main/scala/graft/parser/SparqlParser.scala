package graft.parser

import graft.algebra._
import graft.model._

/** Hand-rolled recursive-descent SPARQL 1.1 query parser producing the
  * [[graft.algebra.Algebra]] ADT.
  *
  * Grammar follows the public W3C SPARQL 1.1 specification (§19.8); the reference
  * consumes an equivalent grammar from its external parser package (kasei/kineo
  * `Package.swift:21` — swift-sparql-syntax), so the algebra this emits mirrors the
  * enum quoted at `Sources/Kineo/SPARQL/QueryRewriting.swift:295-320`.
  *
  * Covered: SELECT/ASK/CONSTRUCT/DESCRIBE, prologue, nested group graph patterns,
  * OPTIONAL (with filter extraction), MINUS, UNION, GRAPH, FILTER/BIND/VALUES,
  * subqueries, property paths, aggregates + GROUP BY/HAVING, ORDER/LIMIT/OFFSET,
  * DISTINCT/REDUCED, EXISTS/NOT EXISTS, the full builtin function surface of
  * [[graft.engine.ExprEval]], blank-node property lists and collections.
  */
final class ParseException(msg: String, pos: Int)
  extends RuntimeException(s"$msg (at offset $pos)")

final case class ParsedQuery(
    form: String, // select | ask | construct | describe
    algebra: Algebra,
    projection: Seq[String],
    constructTemplates: Seq[(Node, Node, Node)],
    describeVars: Seq[String],
    defaultGraphs: Seq[String] = Seq.empty, // FROM <iri>
    namedGraphs: Seq[String] = Seq.empty)   // FROM NAMED <iri>

object SparqlParser {
  def parse(q: String): ParsedQuery = new SparqlParser(q).parseQuery()
}

final class SparqlParser(input: String) {
  private var pos = 0
  private var prefixes = Map.empty[String, String]
  private var base = ""
  private var blankCounter = 0
  private var aggCounter = 0

  // ---- low-level lexing -----------------------------------------------------

  private def ws(): Unit = {
    var go = true
    while (go) {
      go = false
      while (pos < input.length && input(pos).isWhitespace) { pos += 1; go = true }
      if (pos < input.length && input(pos) == '#') {
        while (pos < input.length && input(pos) != '\n') pos += 1
        go = true
      }
    }
  }

  private def fail(msg: String): Nothing = throw new ParseException(msg, pos)

  private def peekKw(kw: String): Boolean = {
    ws()
    val end = pos + kw.length
    end <= input.length && input.substring(pos, end).equalsIgnoreCase(kw) &&
      (end == input.length || !isPNChar(input(end)))
  }

  private def eatKw(kw: String): Boolean = {
    if (peekKw(kw)) { pos += kw.length; true } else false
  }

  private def expectKw(kw: String): Unit =
    if (!eatKw(kw)) fail(s"expected $kw")

  private def peekCh(c: Char): Boolean = { ws(); pos < input.length && input(pos) == c }

  private def eatCh(c: Char): Boolean =
    if (peekCh(c)) { pos += 1; true } else false

  private def expectCh(c: Char): Unit = if (!eatCh(c)) fail(s"expected '$c'")

  private def peekStr(s: String): Boolean = {
    ws(); pos + s.length <= input.length && input.substring(pos, pos + s.length) == s
  }

  private def eatStr(s: String): Boolean =
    if (peekStr(s)) { pos += s.length; true } else false

  private def isPNChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '-'

  // ---- terminals ------------------------------------------------------------

  private def parseIriRef(): String = {
    expectCh('<')
    val start = pos
    while (pos < input.length && input(pos) != '>') pos += 1
    if (pos >= input.length) fail("unterminated IRI")
    val iri = input.substring(start, pos)
    pos += 1
    // RFC 3986 resolution against BASE (absolute IRIs pass through unchanged;
    // relative paths, ./.., and #fragments resolve properly)
    if (base.isEmpty) iri else graft.sources.RdfXml.resolve(base, iri)
  }

  private def parsePrefixedOrIri(): String = {
    ws()
    if (peekCh('<')) parseIriRef()
    else {
      val start = pos
      while (pos < input.length && (isPNChar(input(pos)) || input(pos) == '.') &&
        input(pos) != ':') pos += 1
      val pfx = input.substring(start, pos)
      if (pos >= input.length || input(pos) != ':') { pos = start; fail("expected IRI") }
      pos += 1
      val lstart = pos
      while (pos < input.length && (isPNChar(input(pos)) ||
        (input(pos) == '.' && pos + 1 < input.length && isPNChar(input(pos + 1))))) pos += 1
      val local = input.substring(lstart, pos)
      prefixes.get(pfx) match {
        case Some(ns) => ns + local
        case None => fail(s"unknown prefix: $pfx")
      }
    }
  }

  private def tryVar(): Option[String] = {
    ws()
    if (pos < input.length && (input(pos) == '?' || input(pos) == '$')) {
      pos += 1
      val start = pos
      while (pos < input.length && isPNChar(input(pos))) pos += 1
      Some(input.substring(start, pos))
    } else None
  }

  private def parseVar(): String = tryVar().getOrElse(fail("expected variable"))

  private def parseString(): String = {
    ws()
    val quote = input(pos)
    if (quote != '"' && quote != '\'') fail("expected string")
    val long = pos + 2 < input.length && input(pos + 1) == quote && input(pos + 2) == quote
    val delim = if (long) s"$quote$quote$quote" else quote.toString
    pos += delim.length
    val sb = new StringBuilder
    while (pos < input.length && !input.startsWith(delim, pos)) {
      if (input(pos) == '\\' && pos + 1 < input.length) {
        input(pos + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case '\\' => sb.append('\\')
          case '"' => sb.append('"'); case '\'' => sb.append('\'')
          case 'u' =>
            sb.append(Integer.parseInt(input.substring(pos + 2, pos + 6), 16).toChar)
            pos += 4
          case o => sb.append(o)
        }
        pos += 2
      } else { sb.append(input(pos)); pos += 1 }
    }
    if (pos >= input.length) fail("unterminated string")
    pos += delim.length
    sb.toString
  }

  private def parseLiteral(): Term = {
    val s = parseString()
    if (pos < input.length && input(pos) == '@') {
      pos += 1
      val start = pos
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '-')) pos += 1
      Term.langStr(s, input.substring(start, pos))
    } else if (eatStr("^^")) {
      Lit(s, parsePrefixedOrIri(), null)
    } else Term.str(s)
  }

  private def tryNumeric(): Option[Term] = {
    ws()
    val start = pos
    var p = pos
    if (p < input.length && (input(p) == '+' || input(p) == '-')) p += 1
    var digits = false
    while (p < input.length && input(p).isDigit) { p += 1; digits = true }
    var isDec = false; var isDbl = false
    if (p < input.length && input(p) == '.' && p + 1 < input.length && input(p + 1).isDigit) {
      // DECIMAL ::= [0-9]* '.' [0-9]+ — the integer part may be empty (".5")
      isDec = true; digits = true; p += 1
      while (p < input.length && input(p).isDigit) p += 1
    }
    if (digits && p < input.length && (input(p) == 'e' || input(p) == 'E')) {
      isDbl = true; p += 1
      if (p < input.length && (input(p) == '+' || input(p) == '-')) p += 1
      while (p < input.length && input(p).isDigit) p += 1
    }
    if (!digits) None
    else {
      val lex = input.substring(start, p)
      pos = p
      Some(
        if (isDbl) Lit(lex, Term.xsdDouble, null)
        else if (isDec) Lit(lex, Term.xsdDecimal, null)
        else Lit(lex, Term.xsdInteger, null))
    }
  }

  private def freshBlank(): BNode = { blankCounter += 1; BNode(s"_gen$blankCounter") }

  // ---- prologue -------------------------------------------------------------

  private def parsePrologue(): Unit = {
    var go = true
    while (go) {
      if (eatKw("PREFIX")) {
        ws()
        val start = pos
        while (pos < input.length && input(pos) != ':') pos += 1
        val pfx = input.substring(start, pos).trim
        pos += 1
        prefixes += pfx -> parseIriRef()
      } else if (eatKw("BASE")) base = parseIriRef()
      else go = false
    }
  }

  // ---- query forms ----------------------------------------------------------

  def parseQuery(): ParsedQuery = {
    parsePrologue()
    ws()
    val r =
      if (peekKw("SELECT")) parseSelect(isSub = false)._1
      else if (peekKw("ASK")) parseAsk()
      else if (peekKw("CONSTRUCT")) parseConstruct()
      else if (peekKw("DESCRIBE")) parseDescribe()
      else fail("expected SELECT/ASK/CONSTRUCT/DESCRIBE")
    ws()
    if (pos < input.length) fail(s"trailing input: ${input.substring(pos).take(30)}")
    r
  }

  /** DatasetClause*: FROM <iri> | FROM NAMED <iri> (reference dataset resolution:
    * QueryPlanner.swift:209-244 — default graph = union of FROM graphs). */
  private def parseDatasetClauses(): (Seq[String], Seq[String]) = {
    val defaults = scala.collection.mutable.ListBuffer[String]()
    val named = scala.collection.mutable.ListBuffer[String]()
    while (eatKw("FROM")) {
      if (eatKw("NAMED")) named += parsePrefixedOrIri()
      else defaults += parsePrefixedOrIri()
    }
    (defaults.toSeq, named.toSeq)
  }

  private def parseAsk(): ParsedQuery = {
    expectKw("ASK")
    val (dg, ng) = parseDatasetClauses()
    if (peekKw("WHERE")) eatKw("WHERE")
    val g = parseGroupGraphPattern()
    ParsedQuery("ask", g, Seq.empty, Seq.empty, Seq.empty, dg, ng)
  }

  private def parseDescribe(): ParsedQuery = {
    expectKw("DESCRIBE")
    // DESCRIBE ( VarOrIri+ | '*' ) DatasetClause* WhereClause?
    // (reference describes a LIST of terms/vars,
    // SimpleQueryEvaluation.swift:1305-1319)
    if (eatCh('*')) {
      val (dg, ng) = parseDatasetClauses()
      if (peekKw("WHERE")) eatKw("WHERE")
      val g = parseGroupGraphPattern()
      return ParsedQuery("describe", g, Seq.empty, Seq.empty, Seq("*"), dg, ng)
    }
    val vars = scala.collection.mutable.ListBuffer[String]()
    val iris = scala.collection.mutable.ListBuffer[String]()
    var more = true
    while (more) {
      tryVar() match {
        case Some(name) => vars += name
        case None =>
          ws()
          if (!peekKw("WHERE") && !peekKw("FROM") && !peekCh('{') &&
              pos < input.length && (input(pos) == '<' || input(pos).isLetter))
            iris += parsePrefixedOrIri()
          else more = false
      }
    }
    if (vars.isEmpty && iris.isEmpty) fail("DESCRIBE needs at least one target")
    // constant targets: synthesize a fresh var bound to each IRI in a one-row
    // table, cross-joined (1 row — broadcast-free) with any WHERE pattern
    val iriVars = iris.indices.map(i => s"__desc$i")
    val iriTable =
      if (iris.isEmpty) None
      else Some(ATable(iriVars, Seq(iris.map(i => Some(Iri(i): Term)).toSeq)))
    val (dg, ng) = parseDatasetClauses()
    val hasWhere = peekKw("WHERE") || peekCh('{')
    if (peekKw("WHERE")) eatKw("WHERE")
    val g0: Algebra =
      if (hasWhere) {
        val w = parseGroupGraphPattern()
        iriTable.map(t => AJoin(w, t): Algebra).getOrElse(w)
      } else iriTable.getOrElse(fail("DESCRIBE with variables needs a WHERE clause"))
    ParsedQuery("describe", g0, Seq.empty, Seq.empty,
      vars.toSeq ++ iriVars, dg, ng)
  }

  private def parseConstruct(): ParsedQuery = {
    expectKw("CONSTRUCT")
    def parseTemplateTriples(): Seq[(Node, Node, Node)] = {
      expectCh('{')
      val templates = scala.collection.mutable.ListBuffer[(Node, Node, Node)]()
      while (!peekCh('}')) {
        val s = parseVarOrTermNode()
        val p = parseVerbNode()
        val o = parseVarOrTermNode()
        templates += ((s, p, o))
        var more = eatCh(';')
        while (more && !peekCh('.') && !peekCh('}')) {
          val p2 = parseVerbNode(); val o2 = parseVarOrTermNode()
          templates += ((s, p2, o2))
          more = eatCh(';')
        }
        eatCh('.')
      }
      expectCh('}')
      templates.toSeq
    }
    ws()
    if (!peekCh('{')) {
      // CONSTRUCT WHERE { TriplesTemplate } shortcut (SPARQL 1.1 10.2.3):
      // the pattern doubles as the template. Grammar puts dataset clauses
      // before WHERE in this form.
      val (dg, ng) = parseDatasetClauses()
      expectKw("WHERE")
      val templates = parseTemplateTriples()
      val g: Algebra = BGP(templates.map { case (s, p, o) => QuadPattern(s, p, o) })
      val mod = parseSolutionModifiers(g, Seq.empty, distinct = false, reduced = false)
      return ParsedQuery("construct", mod._1, Seq.empty, templates, Seq.empty, dg, ng)
    }
    val templates = parseTemplateTriples()
    val (dg, ng) = parseDatasetClauses()
    if (peekKw("WHERE")) eatKw("WHERE")
    val g = parseGroupGraphPattern()
    val mod = parseSolutionModifiers(g, Seq.empty, distinct = false, reduced = false)
    ParsedQuery("construct", mod._1, Seq.empty, templates, Seq.empty, dg, ng)
  }

  private def parseVerbNode(): Node = {
    ws()
    if (input(pos) == 'a' && pos + 1 < input.length && !isPNChar(input(pos + 1))) {
      pos += 1
      N.iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    } else tryVar().map(V.apply).getOrElse(N.iri(parsePrefixedOrIri()))
  }

  private def parseVarOrTermNode(): Node = {
    ws()
    tryVar().map(V.apply).getOrElse {
      if (peekCh('<')) N.iri(parseIriRef())
      else if (peekCh('"') || peekCh('\'')) T(parseLiteral())
      else if (peekKw("true")) { eatKw("true"); T(Term.bool(true)) }
      else if (peekKw("false")) { eatKw("false"); T(Term.bool(false)) }
      else if (peekStr("_:")) {
        pos += 2
        val start = pos
        while (pos < input.length && isPNChar(input(pos))) pos += 1
        T(BNode(input.substring(start, pos)))
      }
      else tryNumeric().map(T.apply).getOrElse(N.iri(parsePrefixedOrIri()))
    }
  }

  // ---- SELECT ---------------------------------------------------------------

  /** Returns (query, projectedVars). Also used for subqueries. */
  private def parseSelect(isSub: Boolean): (ParsedQuery, Seq[String]) = {
    expectKw("SELECT")
    val distinct = eatKw("DISTINCT")
    val reduced = !distinct && eatKw("REDUCED")
    var star = false
    val items = scala.collection.mutable.ListBuffer[(String, Option[Expr])]()
    // window applications keyed by output var (reference window extension:
    // `(RANK() OVER (…) AS ?r)` in the projection list)
    val winItems = scala.collection.mutable.Map[String, WinSpec]()
    ws()
    if (eatCh('*')) star = true
    else {
      var go = true
      while (go) {
        ws()
        tryVar() match {
          case Some(v) => items += ((v, None))
          case None =>
            if (eatCh('(')) {
              tryWindowSpec() match {
                case Some(w) =>
                  expectKw("AS")
                  val v = parseVar()
                  expectCh(')')
                  winItems(v) = w.copy(out = v)
                  items += ((v, None))
                case None =>
                  val e = parseExpression()
                  expectKw("AS")
                  val v = parseVar()
                  expectCh(')')
                  items += ((v, Some(e)))
              }
            } else go = false
        }
        ws()
        if (!(pos < input.length && (input(pos) == '?' || input(pos) == '$' || input(pos) == '('))) go = false
      }
      if (items.isEmpty) fail("empty SELECT list")
      // a variable may be assigned/selected at most once in one SELECT clause
      val dup = items.map(_._1).diff(items.map(_._1).distinct).headOption
      for (d <- dup) fail(s"variable ?$d appears more than once in SELECT")
    }
    val (dsDefaults, dsNamed) = parseDatasetClauses()
    if (peekKw("WHERE")) eatKw("WHERE")
    var g = parseGroupGraphPattern()

    // aggregation handling
    val groupKeys = scala.collection.mutable.ListBuffer[String]()
    var groupExtends = List.empty[(String, Expr)]
    var hasGroupBy = false
    if (peekKw("GROUP")) {
      expectKw("GROUP"); expectKw("BY")
      hasGroupBy = true
      var go = true
      while (go) {
        ws()
        tryVar() match {
          case Some(v) => groupKeys += v
          case None =>
            if (eatCh('(')) {
              val e = parseExpression()
              expectKw("AS")
              val v = parseVar()
              expectCh(')')
              groupExtends = groupExtends :+ (v, e)
              groupKeys += v
            } else go = false
        }
        ws()
        if (!(pos < input.length && (input(pos) == '?' || input(pos) == '$' || input(pos) == '('))) go = false
      }
    }
    val having = if (eatKw("HAVING")) Some(parseConstraint()) else None

    // collect aggregates from select items + having
    val aggSpecs = scala.collection.mutable.ListBuffer[AggSpec]()
    def rewriteAggs(e: Expr): Expr = e match {
      case ECall(fn, args) if Seq("count", "sum", "avg", "min", "max", "sample",
          "group_concat").contains(fn) && isAggCall(e) =>
        aggCounter += 1
        val out = s"__agg$aggCounter"
        val (distinctAgg, realArgs, sep) = splitAggArgs(fn, args)
        aggSpecs += AggSpec(out, fn, realArgs.headOption, distinctAgg, sep)
        EVar(out)
      case ECall(fn, args) => ECall(fn, args.map(rewriteAggs))
      case other => other
    }
    val rewrittenItems = items.toSeq.map { case (v, eo) => (v, eo.map(rewriteAggs)) }
    val rewrittenHaving = having.map(rewriteAggs)

    val usesAggs = aggSpecs.nonEmpty || hasGroupBy
    var aggNode: AGroup = null
    if (usesAggs) {
      // SPARQL 1.1 §18.2.4.1: in an aggregate query, only group keys and
      // aggregate results may be projected — SELECT * is therefore invalid,
      // a bare variable must be a GROUP BY key, and variables inside select
      // expressions must be keys, aggregate placeholders, or earlier aliases
      if (star) fail("SELECT * cannot be combined with GROUP BY / aggregates")
      // exact placeholder set, not a name-prefix test — a user-written
      // ?__agg1 must not slip through the grouped-or-aggregated check
      val aggOuts = aggSpecs.map(_.out).toSet
      var allowed = groupKeys.toSet
      val preGroupScope = Algebra.inscope(g)
      def checkGrouped(e: Expr, where: String): Unit = e match {
        case EVar(n) if !allowed.contains(n) && !aggOuts.contains(n) =>
          fail(s"variable ?$n in $where is neither grouped nor aggregated")
        case EExists(p, _) =>
          // §18.2.4.1 reaches into EXISTS arguments too: a pattern var that
          // NAMES a WHERE-clause variable correlates with the outer row, so
          // it must be a group key or aggregate alias; vars private to the
          // pattern are local existentials and are fine.
          for (n <- (Algebra.deepVars(p) intersect preGroupScope).toSeq.sorted
               if !allowed.contains(n) && !aggOuts.contains(n))
            fail(s"variable ?$n inside EXISTS in $where is neither grouped nor aggregated")
        case ECall(_, args) => args.foreach(checkGrouped(_, where))
        case _ => ()
      }
      for ((v, eo) <- rewrittenItems) {
        winItems.get(v) match {
          case Some(w) =>
            // §18.2.4.1 applies inside the window specification too: its
            // input, order and partition vars see the grouped result
            (w.e.toSeq ++ w.ordBy.map(_.e) ++ w.partBy.map(EVar.apply))
              .foreach(checkGrouped(_, "window specification"))
          case None => eo match {
            case None =>
              if (!allowed.contains(v))
                fail(s"variable ?$v is projected but neither grouped nor aggregated")
            case Some(e) => checkGrouped(e, "SELECT expression")
          }
        }
        allowed += v
      }
      rewrittenHaving.foreach(checkGrouped(_, "HAVING"))
    }
    if (usesAggs) {
      for ((v, e) <- groupExtends) g = AExtend(g, v, e)
      g = AGroup(g, groupKeys.toSeq, aggSpecs.toSeq)
      aggNode = g.asInstanceOf[AGroup]
      for (h <- rewrittenHaving) g = AFilter(h, g)
      // bind non-aggregate select expressions / windows over the grouped
      // result, in projection order (a window may reference earlier aliases)
      for ((v, eo) <- rewrittenItems) winItems.get(v) match {
        case Some(w) => g = AWindow(g, Seq(w))
        case None => eo match {
          case Some(e) if e != EVar(v) => g = AExtend(g, v, e)
          case _ => ()
        }
      }
    } else {
      for ((v, eo) <- rewrittenItems) winItems.get(v) match {
        case Some(w) => g = AWindow(g, Seq(w))
        case None => eo.foreach(e => g = AExtend(g, v, e))
      }
    }

    val (g2raw, projected) = parseSolutionModifiersWithProject(g,
      if (star) Algebra.inscope(g).toSeq.sorted else rewrittenItems.map(_._1),
      distinct, reduced, rewriteAggs)
    // ORDER BY conditions may hold aggregate calls (grammar Constraint) —
    // rewriteAggs appends their AggSpecs AFTER the AGroup node above was
    // built. Patch that exact node (reference identity — wrappers may have
    // stacked filters/extends/sorts/a trailing VALUES join around it).
    val g2 = if (aggNode != null && aggNode.aggs.size != aggSpecs.size) {
      val upd = aggNode.copy(aggs = aggSpecs.toSeq)
      def swap(a: Algebra): Algebra = a match {
        case n if n eq aggNode => upd
        case AFilter(e, c) => AFilter(e, swap(c))
        case AExtend(c, v, e) => AExtend(swap(c), v, e)
        case AProject(c, vs) => AProject(swap(c), vs)
        case ADistinct(c) => ADistinct(swap(c))
        case AReduced(c) => AReduced(swap(c))
        case ASlice(c, o, l) => ASlice(swap(c), o, l)
        case AOrderBy(c, ks) => AOrderBy(swap(c), ks)
        case AJoin(l, r) => AJoin(swap(l), swap(r))
        case other => other
      }
      swap(g2raw)
    } else g2raw
    (ParsedQuery("select", g2, projected, Seq.empty, Seq.empty, dsDefaults, dsNamed), projected)
  }

  // ---- window applications (reference extension) ----------------------------

  private val winRankFns = Set("rank", "dense_rank", "row_number", "ntile")
  private val winAggFns =
    Set("count", "sum", "avg", "min", "max", "sample", "group_concat")

  /** Try `FN(args) OVER (PARTITION BY… ORDER BY… [ROWS|RANGE BETWEEN b AND b])`
    * at the current position — the reference's (non-standard) window syntax,
    * parsed by swift-sparql-syntax and planned at kasei/kineo
    * QueryPlanner.swift:699-720 (application model Window.swift). RANGE
    * frames are a Spark-native extension here; the reference throws on them
    * (MaterializedQueryPlan.swift:849-852). Returns None with the position
    * restored when the text is not a window application (e.g. a plain
    * aggregate projection `(COUNT(?x) AS ?c)`). */
  private def tryWindowSpec(): Option[WinSpec] = {
    val save = pos
    val head: Option[(String, Int, Option[Expr], String)] =
      try {
        ws()
        val start = pos
        while (pos < input.length && isPNChar(input(pos))) pos += 1
        val fn = input.substring(start, pos).toLowerCase
        if (!winRankFns.contains(fn) && !winAggFns.contains(fn)) None
        else {
          ws()
          if (!eatCh('(')) None
          else {
            var arg = 0
            var e: Option[Expr] = None
            var sep = " "
            fn match {
              case "rank" | "dense_rank" | "row_number" => ()
              case "ntile" => arg = parseLong().toInt
              case "count" =>
                ws(); if (!eatCh('*')) e = Some(parseExpression())
              case "group_concat" =>
                e = Some(parseExpression())
                ws()
                if (eatCh(';')) {
                  expectKw("SEPARATOR"); ws(); expectCh('='); sep = parseString()
                }
              case _ => e = Some(parseExpression())
            }
            expectCh(')')
            if (eatKw("OVER")) Some((fn, arg, e, sep)) else None
          }
        }
      } catch { case _: ParseException => None }
    head match {
      case None => pos = save; None
      case Some((fn, arg, e, sep)) =>
        // OVER consumed: this IS a window application; errors now propagate
        expectCh('(')
        val partBy = scala.collection.mutable.ListBuffer[String]()
        if (eatKw("PARTITION")) {
          expectKw("BY")
          var v = tryVar()
          if (v.isEmpty) fail("PARTITION BY requires at least one variable")
          while (v.isDefined) { partBy += v.get; v = tryVar() }
        }
        val ordKeys = scala.collection.mutable.ListBuffer[SortKey]()
        if (eatKw("ORDER")) {
          expectKw("BY")
          var go = true
          while (go) {
            ws()
            if (peekKw("ROWS") || peekKw("RANGE") || peekCh(')')) go = false
            else if (eatKw("ASC")) {
              expectCh('('); ordKeys += SortKey(parseExpression()); expectCh(')')
            } else if (eatKw("DESC")) {
              expectCh('('); ordKeys += SortKey(parseExpression(), asc = false)
              expectCh(')')
            } else tryVar() match {
              case Some(v) => ordKeys += SortKey(EVar(v))
              case None =>
                if (peekCh('(')) {
                  expectCh('('); ordKeys += SortKey(parseExpression()); expectCh(')')
                } else go = false
            }
          }
          if (ordKeys.isEmpty) fail("window ORDER BY requires a condition")
        }
        var range = false
        var frame: Option[(Long, Long)] = None
        val rows = eatKw("ROWS")
        if (!rows) range = eatKw("RANGE")
        if (rows || range) {
          expectKw("BETWEEN")
          val lo = parseFrameBound(isStart = true)
          expectKw("AND")
          val hi = parseFrameBound(isStart = false)
          frame = Some((lo, hi))
        }
        expectCh(')')
        if (winRankFns.contains(fn) && ordKeys.isEmpty)
          fail(s"${fn.toUpperCase} window requires ORDER BY")
        if (range && ordKeys.size != 1)
          fail("RANGE frame requires exactly one ORDER BY key")
        if (fn == "ntile" && arg <= 0) fail("NTILE requires a positive bucket count")
        Some(WinSpec("", fn, e, partBy.toSeq, ordKeys.toSeq, frame, arg, sep, range))
    }
  }

  /** One frame bound: UNBOUNDED [PRECEDING|FOLLOWING] (bare UNBOUNDED takes
    * its direction from the bound position, as the reference's test corpus
    * writes it), CURRENT ROW, or `n PRECEDING` / `n FOLLOWING` — encoded in
    * Spark's rowsBetween convention (MinValue/MaxValue = unbounded). */
  private def parseFrameBound(isStart: Boolean): Long = {
    ws()
    if (eatKw("UNBOUNDED")) {
      if (eatKw("PRECEDING")) Long.MinValue
      else if (eatKw("FOLLOWING")) Long.MaxValue
      else if (isStart) Long.MinValue
      else Long.MaxValue
    } else if (eatKw("CURRENT")) { expectKw("ROW"); 0L }
    else {
      val n = parseLong()
      if (eatKw("PRECEDING")) -n
      else if (eatKw("FOLLOWING")) n
      else fail("expected PRECEDING or FOLLOWING after frame offset")
    }
  }

  private def isAggCall(e: Expr): Boolean = e match {
    case ECall(fn, _) => Seq("count", "sum", "avg", "min", "max", "sample",
      "group_concat").contains(fn)
    case _ => false
  }

  /** COUNT(DISTINCT x) parses as args (marker handled at call site). */
  private def splitAggArgs(fn: String, args: Seq[Expr])
      : (Boolean, Seq[Expr], String) = args match {
    case Seq(EConst(Lit("__distinct__", _, _)), rest @ _*) =>
      rest match {
        case init :+ EConst(Lit(sep, dt, _)) if dt == "urn:graft:sep" =>
          (true, init, sep)
        case _ => (true, rest, " ")
      }
    case init :+ EConst(Lit(sep, dt, _)) if dt == "urn:graft:sep" =>
      (false, init, sep)
    case _ => (false, args, " ")
  }

  private def parseSolutionModifiersWithProject(g0: Algebra, proj: Seq[String],
      distinct: Boolean, reduced: Boolean, rewriteAggs: Expr => Expr)
      : (Algebra, Seq[String]) = {
    var g = g0
    // ORDER BY (grammar requires at least one OrderCondition)
    var orderKeys: Seq[SortKey] = Nil
    if (peekKw("ORDER")) {
      expectKw("ORDER"); expectKw("BY")
      val keys = scala.collection.mutable.ListBuffer[SortKey]()
      var go = true
      while (go) {
        ws()
        if (eatKw("ASC")) { expectCh('('); keys += SortKey(rewriteAggs(parseExpression())); expectCh(')') }
        else if (eatKw("DESC")) { expectCh('('); keys += SortKey(rewriteAggs(parseExpression()), asc = false); expectCh(')') }
        else tryVar() match {
          case Some(v) => keys += SortKey(EVar(v))
          case None =>
            if (peekCh('(')) { expectCh('('); keys += SortKey(rewriteAggs(parseExpression())); expectCh(')') }
            else {
              // bare Constraint condition (grammar [24]: BuiltInCall |
              // FunctionCall) — ORDER BY COUNT(?x), ORDER BY str(?n),
              // ORDER BY ex:fn(?v), ORDER BY EXISTS{…}. Keywords that merely
              // FOLLOW the order list (LIMIT, OFFSET, VALUES) are not calls:
              // roll back and end the list when the token doesn't parse.
              val save = pos
              try keys += SortKey(rewriteAggs(parseBuiltinOrFunction()))
              catch { case _: ParseException => pos = save; go = false }
            }
        }
      }
      if (keys.isEmpty) fail("ORDER BY requires at least one order condition")
      orderKeys = keys.toSeq
    }
    // LIMIT / OFFSET in either order (lexically before a trailing VALUES)
    var limit = -1L; var offset = 0L; var sliced = false
    var go = true
    while (go) {
      if (eatKw("LIMIT")) { ws(); limit = parseLong(); sliced = true }
      else if (eatKw("OFFSET")) { ws(); offset = parseLong(); sliced = true }
      else go = false
    }
    // trailing ValuesClause (grammar rules [7]/[8]): joins the WHERE-clause
    // algebra BEFORE ordering/projection/slice (SPARQL 1.1 §18.2.4.5)
    ws()
    if (eatKw("VALUES")) g = AJoin(g, parseValues())
    if (orderKeys.nonEmpty) g = AOrderBy(g, orderKeys)
    if (proj.nonEmpty) g = AProject(g, proj) // CONSTRUCT keeps all template vars
    if (distinct) g = ADistinct(g)
    if (reduced) g = AReduced(g)
    if (sliced) g = ASlice(g, offset, limit)
    (g, proj)
  }

  private def parseSolutionModifiers(g0: Algebra, proj: Seq[String],
      distinct: Boolean, reduced: Boolean): (Algebra, Seq[String]) =
    parseSolutionModifiersWithProject(g0, proj, distinct, reduced, identity)

  private def parseLong(): Long = {
    ws()
    val start = pos
    while (pos < input.length && input(pos).isDigit) pos += 1
    if (pos == start) fail("expected number")
    input.substring(start, pos).toLong
  }

  // ---- group graph patterns -------------------------------------------------

  private def parseGroupGraphPattern(): Algebra = {
    expectCh('{')
    ws()
    if (peekKw("SELECT")) { // subquery
      val (sub, _) = parseSelect(isSub = true)
      expectCh('}')
      return sub.algebra
    }
    var g: Option[Algebra] = None
    val filters = scala.collection.mutable.ListBuffer[Expr]()
    def add(a: Algebra): Unit = g = Some(g.map(AJoin(_, a)).getOrElse(a))

    var go = true
    while (go) {
      ws()
      if (peekCh('}')) go = false
      else if (eatKw("OPTIONAL")) {
        val (inner, innerFilter) = parseGroupWithFilterExtraction()
        val lhs = g.getOrElse(ATable(Seq.empty, Seq(Seq.empty)))
        g = Some(ALeftJoin(lhs, inner, innerFilter))
      }
      else if (eatKw("MINUS")) {
        val inner = parseGroupGraphPattern()
        val lhs = g.getOrElse(ATable(Seq.empty, Seq(Seq.empty)))
        g = Some(AMinus(lhs, inner))
      }
      else if (eatKw("FILTER")) filters += parseConstraint()
      else if (eatKw("BIND")) {
        expectCh('(')
        val e = parseExpression()
        expectKw("AS")
        val v = parseVar()
        expectCh(')')
        val lhs = g.getOrElse(ATable(Seq.empty, Seq(Seq.empty)))
        // grammar note 12 (SPARQL 1.1 §19.8): the BIND target must not be
        // in scope in the group at this point
        if (Algebra.inscope(lhs).contains(v))
          fail(s"BIND would rebind in-scope variable ?$v")
        g = Some(AExtend(lhs, v, e))
      }
      else if (eatKw("VALUES")) add(parseValues())
      else if (eatKw("GRAPH")) {
        val gn: Node = tryVar().map(V.apply).getOrElse(N.iri(parsePrefixedOrIri()))
        val inner = parseGroupGraphPattern()
        add(setGraph(inner, gn))
      }
      else if (eatKw("SERVICE")) {
        val silent = eatKw("SILENT")
        val svc: Node = tryVar().map(V.apply).getOrElse(N.iri(parsePrefixedOrIri()))
        val inner = parseGroupGraphPattern()
        add(graft.algebra.AService(svc, inner, silent))
      }
      else if (peekCh('{')) {
        // group or union chain
        var u = parseGroupGraphPattern()
        while (eatKw("UNION")) u = AUnion(u, parseGroupGraphPattern())
        add(u)
      }
      else {
        // triples block
        val triples = parseTriplesBlock()
        if (triples.isEmpty) go = false else triples.foreach(add)
      }
      eatCh('.')
    }
    expectCh('}')
    var result = g.getOrElse(ATable(Seq.empty, Seq(Seq.empty)))
    for (f <- filters) result = AFilter(f, result)
    result
  }

  /** OPTIONAL body: top-level filters become the left-join expression
    * (reference QueryPlanner.swift:480-552 — the Filter∪Diff decomposition input).
    */
  private def parseGroupWithFilterExtraction(): (Algebra, Option[Expr]) =
    parseGroupGraphPattern() match {
      case AFilter(e, inner) => (inner, Some(e))
      case other => (other, None)
    }

  private def parseValues(): ATable = {
    ws()
    val vars = scala.collection.mutable.ListBuffer[String]()
    val rows = scala.collection.mutable.ListBuffer[Seq[Option[Term]]]()
    if (eatCh('(')) {
      while (!peekCh(')')) vars += parseVar()
      expectCh(')')
      expectCh('{')
      while (!peekCh('}')) {
        expectCh('(')
        val row = scala.collection.mutable.ListBuffer[Option[Term]]()
        while (!peekCh(')')) row += parseDataValue()
        expectCh(')')
        if (row.size != vars.size)
          fail(s"VALUES row has ${row.size} values for ${vars.size} variables")
        rows += row.toSeq
      }
      expectCh('}')
    } else {
      vars += parseVar()
      expectCh('{')
      while (!peekCh('}')) rows += Seq(parseDataValue())
      expectCh('}')
    }
    ATable(vars.toSeq, rows.toSeq)
  }

  private def parseDataValue(): Option[Term] = {
    ws()
    if (eatKw("UNDEF")) None
    else if (peekCh('<')) Some(Iri(parseIriRef()))
    else if (peekCh('"') || peekCh('\'')) Some(parseLiteral())
    else if (eatKw("true")) Some(Term.bool(true))
    else if (eatKw("false")) Some(Term.bool(false))
    else tryNumeric().orElse(Some(Lit(parsePrefixedOrIri(), Term.xsdString, null)).map(l => Iri(l.lexForm)))
  }

  /** Rewrite DefaultGraph positions inside an algebra to the given graph node. */
  private def setGraph(a: Algebra, g: Node): Algebra = a match {
    case BGP(ps) => BGP(ps.map(p => if (p.g == DefaultGraph) p.copy(g = g) else p))
    case APath(s, p, o, DefaultGraph) => APath(s, p, o, g)
    case AJoin(l, r) => AJoin(setGraph(l, g), setGraph(r, g))
    case ALeftJoin(l, r, e) => ALeftJoin(setGraph(l, g), setGraph(r, g), e)
    case AMinus(l, r) => AMinus(setGraph(l, g), setGraph(r, g))
    case AUnion(l, r) => AUnion(setGraph(l, g), setGraph(r, g))
    case AFilter(e, c) => AFilter(e, setGraph(c, g))
    case AExtend(c, v, e) => AExtend(setGraph(c, g), v, e)
    case other => other
  }

  // ---- triples + paths ------------------------------------------------------

  /** Parse a triples block; plain-IRI predicates accumulate into one BGP, path
    * predicates become APath nodes.
    */
  private def parseTriplesBlock(): Seq[Algebra] = {
    val bgp = scala.collection.mutable.ListBuffer[QuadPattern]()
    val paths = scala.collection.mutable.ListBuffer[APath]()
    var go = true
    while (go) {
      ws()
      if (peekCh('}') || peekCh('{') || pos >= input.length ||
        peekKw("OPTIONAL") || peekKw("MINUS") || peekKw("FILTER") || peekKw("BIND") ||
        peekKw("VALUES") || peekKw("GRAPH") || peekKw("SERVICE") ||
        peekKw("GROUP") || peekKw("HAVING") || peekKw("ORDER") || peekKw("LIMIT") ||
        peekKw("OFFSET") || peekKw("UNION")) go = false
      else {
        parseTriplesSameSubject(bgp, paths)
        if (!eatCh('.')) go = false
      }
    }
    val out = scala.collection.mutable.ListBuffer[Algebra]()
    if (bgp.nonEmpty) out += BGP(bgp.toSeq)
    out ++= paths
    out.toSeq
  }

  private def parseTriplesSameSubject(bgp: scala.collection.mutable.ListBuffer[QuadPattern],
      paths: scala.collection.mutable.ListBuffer[APath]): Unit = {
    val s = parseNodeOrBlank(bgp, paths)
    parsePropertyList(s, bgp, paths)
  }

  private def parseNodeOrBlank(bgp: scala.collection.mutable.ListBuffer[QuadPattern],
      paths: scala.collection.mutable.ListBuffer[APath]): Node = {
    ws()
    if (peekCh('[')) {
      expectCh('[')
      val b = T(freshBlank())
      if (!peekCh(']')) parsePropertyList(b, bgp, paths)
      expectCh(']')
      b
    } else if (peekCh('(')) {
      // RDF collection
      expectCh('(')
      val items = scala.collection.mutable.ListBuffer[Node]()
      while (!peekCh(')')) items += parseNodeOrBlank(bgp, paths)
      expectCh(')')
      val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      if (items.isEmpty) N.iri(rdf + "nil")
      else {
        val cells = items.map(_ => T(freshBlank()))
        for (i <- items.indices) {
          bgp += QuadPattern(cells(i), N.iri(rdf + "first"), items(i))
          bgp += QuadPattern(cells(i), N.iri(rdf + "rest"),
            if (i + 1 < items.size) cells(i + 1) else N.iri(rdf + "nil"))
        }
        cells.head
      }
    } else parseVarOrTermNode()
  }

  private def parsePropertyList(s: Node,
      bgp: scala.collection.mutable.ListBuffer[QuadPattern],
      paths: scala.collection.mutable.ListBuffer[APath]): Unit = {
    var go = true
    while (go) {
      ws()
      val verb: Either[Node, PathE] = peekVerb()
      var more = true
      while (more) {
        val o = parseNodeOrBlank(bgp, paths)
        verb match {
          case Left(p) => bgp += QuadPattern(s, p, o)
          case Right(p) => paths += APath(s, p, o)
        }
        more = eatCh(',')
      }
      // trailing ';' is legal (the following Verb+ObjectList is optional): stop
      // when the next token cannot start a verb
      go = eatCh(';') && !peekCh('.') && !peekCh('}') && !peekCh(']') &&
        !Seq("FILTER", "OPTIONAL", "MINUS", "BIND", "VALUES", "GRAPH", "SERVICE",
          "UNION", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET").exists(peekKw)
    }
  }

  /** A verb is a var, 'a', a plain IRI, or a property path. Paths reduce to
    * Left(iri-node) when they are a bare link.
    */
  private def peekVerb(): Either[Node, PathE] = {
    ws()
    tryVar() match {
      case Some(v) => Left(V(v))
      case None =>
        val p = parsePath()
        p match {
          case PLink(iri) => Left(N.iri(iri))
          case other => Right(other)
        }
    }
  }

  // path grammar: alternative > sequence > elt-or-inverse > elt > primary + mod
  private def parsePath(): PathE = {
    var p = parsePathSequence()
    while (peekCh('|')) { expectCh('|'); p = PAlt(p, parsePathSequence()) }
    p
  }

  private def parsePathSequence(): PathE = {
    var p = parsePathEltOrInverse()
    while (peekCh('/')) { expectCh('/'); p = PSeq(p, parsePathEltOrInverse()) }
    p
  }

  private def parsePathEltOrInverse(): PathE = {
    if (eatCh('^')) PInv(parsePathElt()) else parsePathElt()
  }

  private def parsePathElt(): PathE = {
    val prim = parsePathPrimary()
    ws()
    if (pos < input.length) input(pos) match {
      case '+' => pos += 1; PPlus(prim)
      case '*' => pos += 1; PStar(prim)
      case '?' if !(pos + 1 < input.length && isPNChar(input(pos + 1))) =>
        pos += 1; PZeroOne(prim)
      case _ => prim
    } else prim
  }

  private def parsePathPrimary(): PathE = {
    ws()
    if (eatCh('(')) { val p = parsePath(); expectCh(')'); p }
    else if (eatCh('!')) {
      val fwd = scala.collection.mutable.ListBuffer[String]()
      val rev = scala.collection.mutable.ListBuffer[String]()
      def one(): Unit =
        if (eatCh('^')) rev += parseIriOrA() else fwd += parseIriOrA()
      if (eatCh('(')) {
        one()
        while (eatCh('|')) one()
        expectCh(')')
      } else one()
      PNeg(fwd.toSeq, rev.toSeq)
    }
    else PLink(parseIriOrA())
  }

  private def parseIriOrA(): String = {
    ws()
    if (input(pos) == 'a' && (pos + 1 >= input.length || !isPNChar(input(pos + 1))) &&
      input(pos + 1) != ':') {
      pos += 1
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    } else parsePrefixedOrIri()
  }

  // ---- expressions ----------------------------------------------------------

  private def parseConstraint(): Expr = {
    ws()
    if (peekCh('(')) { expectCh('('); val e = parseExpression(); expectCh(')'); e }
    else parseBuiltinOrFunction()
  }

  def parseExpression(): Expr = parseOr()

  private def parseOr(): Expr = {
    var e = parseAnd()
    while (eatStr("||")) e = ECall("||", Seq(e, parseAnd()))
    e
  }

  private def parseAnd(): Expr = {
    var e = parseRelational()
    while (eatStr("&&")) e = ECall("&&", Seq(e, parseRelational()))
    e
  }

  private def parseRelational(): Expr = {
    val e = parseAdditive()
    ws()
    if (eatKw("NOT")) { expectKw("IN"); ECall("notin", e +: parseExprList()) }
    else if (eatKw("IN")) ECall("in", e +: parseExprList())
    else if (eatStr("!=")) ECall("!=", Seq(e, parseAdditive()))
    else if (eatStr("<=")) ECall("<=", Seq(e, parseAdditive()))
    else if (eatStr(">=")) ECall(">=", Seq(e, parseAdditive()))
    else if (peekCh('=') && !peekStr("=>")) { pos += 1; ECall("=", Seq(e, parseAdditive())) }
    else if (peekCh('<') && !looksLikeIri()) { pos += 1; ECall("<", Seq(e, parseAdditive())) }
    else if (peekCh('>')) { pos += 1; ECall(">", Seq(e, parseAdditive())) }
    else e
  }

  private def looksLikeIri(): Boolean = {
    // '<' followed by non-space non-'=' chars then '>' on same "token" = IRI
    var p = pos + 1
    while (p < input.length && !input(p).isWhitespace && input(p) != '>' && p - pos < 200) p += 1
    p < input.length && input(p) == '>'
  }

  private def parseExprList(): Seq[Expr] = {
    expectCh('(')
    val es = scala.collection.mutable.ListBuffer[Expr]()
    if (!peekCh(')')) {
      es += parseExpression()
      while (eatCh(',')) es += parseExpression()
    }
    expectCh(')')
    es.toSeq
  }

  private def parseAdditive(): Expr = {
    var e = parseMultiplicative()
    var go = true
    while (go) {
      ws()
      if (peekCh('+')) { pos += 1; e = ECall("+", Seq(e, parseMultiplicative())) }
      else if (peekCh('-')) { pos += 1; e = ECall("-", Seq(e, parseMultiplicative())) }
      else go = false
    }
    e
  }

  private def parseMultiplicative(): Expr = {
    var e = parseUnary()
    var go = true
    while (go) {
      ws()
      if (peekCh('*')) { pos += 1; e = ECall("*", Seq(e, parseUnary())) }
      else if (peekCh('/')) { pos += 1; e = ECall("/", Seq(e, parseUnary())) }
      else go = false
    }
    e
  }

  private def parseUnary(): Expr = {
    ws()
    if (eatStr("!")) ECall("!", Seq(parseUnary()))
    else if (peekCh('+') && !(pos + 1 < input.length && input(pos + 1).isDigit)) {
      pos += 1; parseUnary()
    }
    else if (peekCh('-') && !(pos + 1 < input.length && input(pos + 1).isDigit)) {
      pos += 1; ECall("neg", Seq(parseUnary()))
    }
    else parsePrimary()
  }

  private def parsePrimary(): Expr = {
    ws()
    if (peekCh('(')) { expectCh('('); val e = parseExpression(); expectCh(')'); e }
    else tryVar().map(EVar.apply).getOrElse {
      if (peekCh('"') || peekCh('\'')) EConst(parseLiteral())
      else if (peekCh('<')) castOrExtension(parseIriRef())
      else tryNumeric().map(EConst.apply).getOrElse(parseBuiltinOrFunction())
    }
  }

  private val xsdCasts = Map(
    Term.xsdInteger -> "xsd:integer", Term.xsdDecimal -> "xsd:decimal",
    Term.xsdFloat -> "xsd:float", Term.xsdDouble -> "xsd:double",
    Term.xsdBoolean -> "xsd:boolean", Term.xsdString -> "xsd:string",
    Term.xsdDateTime -> "xsd:datetime", Term.xsdDate -> "xsd:date")

  private def castOrExtension(iri: String): Expr = {
    ws()
    if (peekCh('(')) ECall(xsdCasts.getOrElse(iri, iri), parseExprList())
    else EConst(Iri(iri))
  }

  private val zeroArg = Set("rand", "now", "uuid", "struuid", "bnode")

  private def parseBuiltinOrFunction(): Expr = {
    ws()
    // BooleanLiteral primary (SPARQL grammar [134]): bare true/false. A
    // keyword followed by ':' is a prefixed name (PN_PREFIX may legally be
    // "true"/"false"/"exists"; ':' is not a PN char so peekKw alone accepts it)
    def kwHere(kw: String): Boolean =
      peekKw(kw) && (pos + kw.length >= input.length || input(pos + kw.length) != ':')
    if (kwHere("true") && eatKw("true")) return EConst(Term.bool(true))
    if (kwHere("false") && eatKw("false")) return EConst(Term.bool(false))
    if (kwHere("EXISTS") && eatKw("EXISTS"))
      return EExists(parseGroupGraphPattern(), negated = false)
    if (kwHere("NOT")) { expectKw("NOT"); expectKw("EXISTS")
      return EExists(parseGroupGraphPattern(), negated = true) }
    val start = pos
    while (pos < input.length && (isPNChar(input(pos)))) pos += 1
    val word = input.substring(start, pos)
    if (word.isEmpty) {
      // maybe a prefixed-name function call
      pos = start
      val iri = parsePrefixedOrIri()
      return castOrExtension(iri)
    }
    val fn0 = word.toLowerCase
    // prefixed name? (word followed by ':')
    if (pos < input.length && input(pos) == ':' && prefixes.contains(word)) {
      pos = start
      val iri = parsePrefixedOrIri()
      return castOrExtension(iri)
    }
    val fn = fn0 match {
      case "isuri" => "isiri"
      case "ucase" | "lcase" | "strlen" | "concat" | "contains" | "strstarts" |
           "strends" | "strbefore" | "strafter" | "substr" | "replace" | "regex" |
           "encode_for_uri" | "abs" | "round" | "ceil" | "floor" | "rand" | "now" |
           "year" | "month" | "day" | "hours" | "minutes" | "seconds" | "timezone" |
           "tz" | "md5" | "sha1" | "sha256" | "sha384" | "sha512" | "str" | "lang" |
           "datatype" | "iri" | "uri" | "bnode" | "strdt" | "strlang" | "uuid" |
           "struuid" | "bound" | "coalesce" | "if" | "sameterm" | "isiri" |
           "isblank" | "isliteral" | "isnumeric" | "langmatches" |
           "count" | "sum" | "avg" | "min" | "max" | "sample" | "group_concat" => fn0
      case other => fail(s"unknown function: $other")
    }
    // aggregates: handle COUNT(*) / DISTINCT / SEPARATOR
    if (Seq("count", "sum", "avg", "min", "max", "sample", "group_concat").contains(fn)) {
      expectCh('(')
      val distinct = eatKw("DISTINCT")
      val args = scala.collection.mutable.ListBuffer[Expr]()
      ws()
      if (eatCh('*')) () // COUNT(*) — no args
      else {
        args += parseExpression()
        while (eatCh(',')) args += parseExpression()
      }
      var sep = ""
      var hasSep = false
      if (eatCh(';')) {
        expectKw("SEPARATOR")
        expectCh('=')
        sep = parseString()
        hasSep = true
      }
      expectCh(')')
      val marked = (if (distinct) Seq(EConst(Lit("__distinct__", Term.xsdString, null))) else Seq.empty) ++
        args.toSeq ++
        (if (hasSep) Seq(EConst(Lit(sep, "urn:graft:sep", null))) else Seq.empty)
      return ECall(fn, marked)
    }
    if (zeroArg.contains(fn)) {
      ws()
      if (peekCh('(')) { expectCh('('); val inner = if (!peekCh(')')) Some(parseExpression()) else None; expectCh(')')
        return ECall(fn, inner.toSeq) }
      return ECall(fn, Seq.empty)
    }
    ECall(fn, parseExprList())
  }
}
