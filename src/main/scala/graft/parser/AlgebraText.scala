package graft.parser

import graft.algebra._
import graft.model._

/** Serialize algebra back to SPARQL text — what an HTTP SERVICE client ships to
  * a remote endpoint (reference builds the query string in
  * kasei/kineo `Sources/Kineo/SPARQL/SPARQLClient.swift:25-110`).
  *
  * Covers the pattern algebra that can appear inside SERVICE: BGP, paths,
  * join/optional/minus/union, filter/bind, VALUES, subselect modifiers.
  */
object AlgebraText {

  /** A complete SELECT query for the pattern, projecting `vars`. */
  def selectQuery(a: Algebra, vars: Seq[String]): String = {
    val proj = if (vars.isEmpty) "*" else vars.map("?" + _).mkString(" ")
    s"SELECT $proj WHERE { ${pattern(a)} }"
  }

  def pattern(a: Algebra): String = a match {
    case BGP(ps) => ps.map(quad).mkString(" ")
    case APath(s, p, o, g) =>
      val t = s"${node(s)} ${path(p)} ${node(o)} ."
      g match {
        case DefaultGraph => t
        case gn => s"GRAPH ${node(gn)} { $t }"
      }
    case AJoin(l, r) =>
      // non-BGP operands serialize inside their own group braces: a top-level
      // FILTER/BIND in an operand scopes over that operand ONLY (W3C algebra
      // filter-nested-2 — flattening `Join(A, Filter(unit))` into one group
      // would let the filter see A's bindings and change results). Braces do
      // not hide an operand's bindings from filters OUTSIDE the join, so
      // bracing is semantics-preserving for every other shape.
      def opnd(x: Algebra): String = x match {
        case _: BGP | _: APath => pattern(x)
        case other => s"{ ${pattern(other)} }"
      }
      s"${opnd(l)} ${opnd(r)}"
    case ALeftJoin(l, r, None) => s"${pattern(l)} OPTIONAL { ${pattern(r)} }"
    case ALeftJoin(l, r, Some(e)) =>
      s"${pattern(l)} OPTIONAL { ${pattern(r)} FILTER(${expr(e)}) }"
    case AMinus(l, r) => s"${pattern(l)} MINUS { ${pattern(r)} }"
    case AUnion(l, r) => s"{ ${pattern(l)} } UNION { ${pattern(r)} }"
    case AFilter(e, c) => s"${pattern(c)} FILTER(${expr(e)})"
    case AExtend(c, v, e) => s"${pattern(c)} BIND(${expr(e)} AS ?$v)"
    case AProject(c, vs) =>
      s"{ SELECT ${vs.map("?" + _).mkString(" ")} WHERE { ${pattern(c)} } }"
    case ADistinct(c) => s"{ SELECT DISTINCT * WHERE { ${pattern(c)} } }"
    case AReduced(c) => s"{ SELECT REDUCED * WHERE { ${pattern(c)} } }"
    case ASlice(c, off, lim) =>
      val l = if (lim >= 0) s" LIMIT $lim" else ""
      val o = if (off > 0) s" OFFSET $off" else ""
      s"{ SELECT * WHERE { ${pattern(c)} }$l$o }"
    case AOrderBy(c, keys) =>
      val ks = keys.map(k =>
        if (k.asc) s"ASC(${expr(k.e)})" else s"DESC(${expr(k.e)})").mkString(" ")
      s"{ SELECT * WHERE { ${pattern(c)} } ORDER BY $ks }"
    case ATable(vs, rows) =>
      val head = vs.map("?" + _).mkString("(", " ", ")")
      val data = rows.map(r =>
        r.map(_.map(term).getOrElse("UNDEF")).mkString("(", " ", ")")).mkString(" ")
      s"VALUES $head { $data }"
    case AGroup(c, keys, aggs) =>
      val sel = keys.map("?" + _) ++ aggs.map(a => s"(${aggText(a)} AS ?${a.out})")
      val grp = if (keys.isEmpty) "" else s" GROUP BY ${keys.map("?" + _).mkString(" ")}"
      s"{ SELECT ${sel.mkString(" ")} WHERE { ${pattern(c)} }$grp }"
    case AWindow(c, fns) =>
      // subselect projecting the child's scope plus the window outputs —
      // the reference's window extension syntax (Window.swift;
      // QueryPlanner.swift:699-720)
      val inVars = Algebra.inscope(c).toSeq.sorted
      val sel = inVars.map("?" + _) ++ fns.map(f => s"(${winText(f)} AS ?${f.out})")
      s"{ SELECT ${sel.mkString(" ")} WHERE { ${pattern(c)} } }"
    case AService(ep, child, silent) =>
      val target = ep match {
        case V(v) => "?" + v
        case T(t) => term(t)
        case DefaultGraph =>
          throw new IllegalArgumentException("DefaultGraph as SERVICE endpoint")
      }
      s"SERVICE ${if (silent) "SILENT " else ""}$target { ${pattern(child)} }"
    case other =>
      throw new UnsupportedOperationException(s"SERVICE pattern: ${other.getClass.getSimpleName}")
  }

  /** SPARQL string-literal escaping for serialized separators: a separator
    * containing '"', '\' or a control char must re-parse to itself (the
    * parser's parseString unescapes the same set). */
  private def sepText(sep: String): String = sep.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c => c.toString
  }

  private def winText(w: WinSpec): String = {
    val call = w.fn match {
      case "rank" | "dense_rank" | "row_number" => s"${w.fn.toUpperCase}()"
      case "ntile" => s"NTILE(${w.arg})"
      case "count" if w.e.isEmpty => "COUNT(*)"
      case "group_concat" =>
        s"""GROUP_CONCAT(${w.e.map(expr).getOrElse("*")}; SEPARATOR="${sepText(w.sep)}")"""
      case fn => s"${fn.toUpperCase}(${w.e.map(expr).getOrElse("*")})"
    }
    def bound(v: Long, isStart: Boolean): String = v match {
      case Long.MinValue => "UNBOUNDED PRECEDING"
      case Long.MaxValue => "UNBOUNDED FOLLOWING"
      case 0L => "CURRENT ROW"
      case n if n < 0 => s"${-n} PRECEDING"
      case n => s"$n FOLLOWING"
    }
    val clauses = Seq(
      if (w.partBy.isEmpty) ""
      else s"PARTITION BY ${w.partBy.map("?" + _).mkString(" ")}",
      if (w.ordBy.isEmpty) ""
      else "ORDER BY " + w.ordBy.map(k =>
        if (k.asc) s"ASC(${expr(k.e)})" else s"DESC(${expr(k.e)})").mkString(" "),
      w.frame.map { case (lo, hi) =>
        s"${if (w.range) "RANGE" else "ROWS"} BETWEEN ${bound(lo, true)} AND ${bound(hi, false)}"
      }.getOrElse("")).filter(_.nonEmpty)
    s"$call OVER (${clauses.mkString(" ")})"
  }

  private def quad(q: QuadPattern): String = {
    val t = s"${node(q.s)} ${node(q.p)} ${node(q.o)} ."
    q.g match {
      case DefaultGraph => t
      case g => s"GRAPH ${node(g)} { $t }"
    }
  }

  def node(n: Node): String = n match {
    case V(name) => "?" + name
    case T(t) => term(t)
    case DefaultGraph => throw new IllegalArgumentException("DefaultGraph as term")
  }

  def term(t: Term): String = graft.sources.RdfIO.serializeTerm(t)

  def path(p: PathE): String = p match {
    case PLink(iri) => s"<$iri>"
    case PInv(x) => s"^(${path(x)})"
    case PSeq(a, b) => s"(${path(a)}/${path(b)})"
    case PAlt(a, b) => s"(${path(a)}|${path(b)})"
    case PNeg(fwd, rev) =>
      val parts = fwd.map(i => s"<$i>") ++ rev.map(i => s"^<$i>")
      s"!(${parts.mkString("|")})"
    case PPlus(x) => s"(${path(x)})+"
    case PStar(x) => s"(${path(x)})*"
    case PZeroOne(x) => s"(${path(x)})?"
  }

  private def aggText(a: AggSpec): String = {
    val d = if (a.distinct) "DISTINCT " else ""
    a.fn match {
      case "count" if a.e.isEmpty => s"COUNT($d*)"
      case "group_concat" =>
        s"""GROUP_CONCAT($d${a.e.map(expr).getOrElse("*")}; SEPARATOR="${sepText(a.sep)}")"""
      case fn => s"${fn.toUpperCase}($d${a.e.map(expr).getOrElse("*")})"
    }
  }

  private val infix = Set("=", "!=", "<", "<=", ">", ">=", "+", "-", "*", "/", "&&", "||")
  private val xsdCasts = Map(
    "xsd:integer" -> (Term.XSD + "integer"), "xsd:decimal" -> (Term.XSD + "decimal"),
    "xsd:float" -> (Term.XSD + "float"), "xsd:double" -> (Term.XSD + "double"),
    "xsd:string" -> (Term.XSD + "string"), "xsd:boolean" -> (Term.XSD + "boolean"),
    "xsd:datetime" -> (Term.XSD + "dateTime"), "xsd:date" -> (Term.XSD + "date"))

  def expr(e: Expr): String = e match {
    case EVar(n) => "?" + n
    case EConst(t) => term(t)
    case EExists(p, neg) =>
      (if (neg) "NOT EXISTS" else "EXISTS") + s" { ${pattern(p)} }"
    case ECall(op, Seq(a, b)) if infix.contains(op) =>
      s"(${expr(a)} ${op} ${expr(b)})"
    case ECall("!", Seq(a)) => s"(!${expr(a)})"
    case ECall("neg", Seq(a)) => s"(-${expr(a)})"
    case ECall("in", v +: rest) =>
      s"(${expr(v)} IN (${rest.map(expr).mkString(", ")}))"
    case ECall("notin", v +: rest) =>
      s"(${expr(v)} NOT IN (${rest.map(expr).mkString(", ")}))"
    case ECall(cast, args) if xsdCasts.contains(cast) =>
      s"<${xsdCasts(cast)}>(${args.map(expr).mkString(", ")})"
    case ECall(fn, args) if fn.contains(":") => // extension function by IRI
      s"<$fn>(${args.map(expr).mkString(", ")})"
    case ECall(fn, args) => s"${fn.toUpperCase}(${args.map(expr).mkString(", ")})"
  }
}
