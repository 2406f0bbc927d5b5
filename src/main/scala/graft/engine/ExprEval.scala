package graft.engine

import graft.algebra._
import graft.model._

/** SPARQL expression interpreter.
  *
  * Re-implements the semantics of the reference's `ExpressionEvaluator`
  * (kasei/kineo `Sources/Kineo/SPARQL/Expression.swift:28-876`) as a Scala
  * interpreter used inside Spark UDFs: every builtin propagates *row-local errors*
  * (thrown [[EvalError]], mapped to SQL NULL at the UDF boundary) rather than
  * failing the query — FILTER drops the row, BIND leaves the variable unbound
  * (`MaterializedQueryPlan.swift:432-438`, `506-511`).
  */
final class EvalError(msg: String) extends RuntimeException(msg) {
  override def fillInStackTrace(): Throwable = this // cheap: thrown per row
}

object ExprEval {
  import Term._

  def err(msg: String): Nothing = throw new EvalError(msg)

  /** Evaluation context: NOW fixed per query (reference Expression.swift:88,97);
    * extension functions keyed by IRI; bnode labels scoped per row. */
  final case class Ctx(nowEpochUs: Long,
      extensions: Map[String, Seq[Term] => Term] = Map.empty) extends Serializable

  /** Per-row blank-node label scope (reference NextRowPlan,
    * MaterializedQueryPlan.swift:517-537 + Expression.swift:103-105): BNODE("x")
    * evaluated twice for the same solution row must yield the SAME blank node,
    * while different rows yield different ones. `nonce` is a per-row unique value
    * (the compiler passes a monotonic row id); `exprId` disambiguates argless
    * BNODE() across distinct compiled expressions sharing a row.
    */
  final class BnodeScope(nonce: Long, scopeId: Int, exprId: Int) {
    private var n = 0
    private def safe(s: String): String = {
      // bnode labels must stay in a safe charset; hash arbitrary user labels.
      // Distinct prefixes keep the plain and hashed namespaces disjoint (a
      // plain alphanumeric label can otherwise collide with another label's
      // hex hash).
      if (s.forall(ch => ch.isLetterOrDigit && ch < 128)) "p" + s
      else "h" + java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(s))
    }
    /** Deterministic per (scope, row, label): BNODE("x") co-refers across all
      * expressions sharing the nonce column (SPARQL 17.4.2.9 — same solution
      * mapping, same simple literal, same blank node). scopeId is the nonce
      * COLUMN's creation id: a nonce column re-created after a join gets a new
      * scope, so its monotonically_increasing_id values can never alias labels
      * minted under another scope for different rows. */
    def labeled(label: String): BNode =
      BNode("rb" + java.lang.Long.toHexString(nonce) + "s" + scopeId + "x" + safe(label))
    /** Fresh per evaluation; unique across a row's expressions via exprId. */
    def fresh(): BNode = {
      n += 1
      BNode("rf" + java.lang.Long.toHexString(nonce) + "s" + scopeId + "e" + exprId + "n" + n)
    }
  }

  /** Driver-side fallback scope (one-off evals outside a row context). */
  def freshScope(): BnodeScope =
    new BnodeScope(java.util.concurrent.ThreadLocalRandom.current().nextLong(), -1, 0)

  // ---- numeric tower (reference NumericValue, MaterializedQueryPlan.swift:1380-1434)
  sealed trait Num { def d: Double }
  final case class NInt(v: Long) extends Num { def d: Double = v.toDouble }
  final case class NDec(v: BigDecimal) extends Num { def d: Double = v.toDouble }
  final case class NFlt(v: Float) extends Num { def d: Double = v.toDouble }
  final case class NDbl(v: Double) extends Num { def d: Double = v }

  def numOf(t: Term): Num = t match {
    case Lit(l, dt, _) if numericTypes.contains(dt) =>
      try {
        dt match {
          case `xsdDouble` => NDbl(java.lang.Double.parseDouble(l))
          case `xsdFloat` => NFlt(java.lang.Float.parseFloat(l))
          case `xsdDecimal` => NDec(BigDecimal(l))
          case _ => NInt(java.lang.Long.parseLong(l.trim match {
            case s if s.startsWith("+") => s.substring(1); case s => s
          }))
        }
      } catch { case _: NumberFormatException => err(s"bad numeric literal: $l") }
    case _ => err(s"not numeric: $t")
  }

  def numTerm(n: Num): Term = n match {
    case NInt(v) => Term.int(v)
    case NDec(v) => Term.dec(v)
    case NFlt(v) => Lit(v.toString, xsdFloat, null)
    case NDbl(v) => Term.dbl(v)
  }

  /** Type promotion (reference Expression.swift:538-563). */
  def promote(a: Num, b: Num)(fi: (Long, Long) => Long, fd: (BigDecimal, BigDecimal) => BigDecimal,
      ff: (Double, Double) => Double): Num = (a, b) match {
    case (NInt(x), NInt(y)) => NInt(fi(x, y))
    case (x, y) if x.isInstanceOf[NDbl] || y.isInstanceOf[NDbl] => NDbl(ff(x.d, y.d))
    case (x, y) if x.isInstanceOf[NFlt] || y.isInstanceOf[NFlt] => NFlt(ff(x.d, y.d).toFloat)
    case (x, y) =>
      val dx = x match { case NDec(v) => v; case NInt(v) => BigDecimal(v); case o => BigDecimal(o.d) }
      val dy = y match { case NDec(v) => v; case NInt(v) => BigDecimal(v); case o => BigDecimal(o.d) }
      NDec(fd(dx, dy))
  }

  def numCompare(a: Num, b: Num): Int = (a, b) match {
    case (NInt(x), NInt(y)) => java.lang.Long.compare(x, y)
    case (NDec(x), NDec(y)) => x.compare(y)
    case _ => java.lang.Double.compare(a.d, b.d)
  }

  // ---- value comparison (reference sparqlCompare, Expression.swift:903-957)

  private def dateTimeUs(t: Lit): Long =
    TermId.tryInlineDateTime(t.lexForm) match {
      case Some(id) => TermId.payload(id) - TermId.BIAS
      case None =>
        try java.time.OffsetDateTime.parse(t.lexForm).toInstant
          .toEpochMilli * 1000L
        catch { case _: Exception => err(s"bad dateTime: ${t.lexForm}") }
    }

  /** SPARQL value comparison for <,<=,>,>= — errors on incomparable operands. */
  def valueCompare(a: Term, b: Term): Int = (a, b) match {
    case (la: Lit, lb: Lit) =>
      if (numericTypes.contains(la.datatype) && numericTypes.contains(lb.datatype))
        numCompare(numOf(la), numOf(lb))
      else if (isStringy(la) && isStringy(lb) && la.lang == lb.lang)
        la.lexForm.compareTo(lb.lexForm)
      else if (la.datatype == xsdBoolean && lb.datatype == xsdBoolean)
        java.lang.Boolean.compare(la.lexForm == "true", lb.lexForm == "true")
      else if (la.datatype == xsdDateTime && lb.datatype == xsdDateTime)
        java.lang.Long.compare(dateTimeUs(la), dateTimeUs(lb))
      else if (la.datatype == xsdDate && lb.datatype == xsdDate)
        la.lexForm.compareTo(lb.lexForm) // ISO dates compare lexically
      else if (la.datatype == xsdTime && lb.datatype == xsdTime)
        la.lexForm.compareTo(lb.lexForm)
      else if (durationTypes.contains(la.datatype) && durationTypes.contains(lb.datatype)) {
        // XSD duration order is partial: defined when the month components
        // agree (compare the day/time remainder) or the day/time components
        // agree (compare months) — this subsumes the total orders on the two
        // restricted types. Anything else is indeterminate (a month is 28-31
        // days depending on the anchor date) → error.
        val (ma, ua) = durOf(la); val (mb, ub) = durOf(lb)
        if (ma == mb) java.lang.Long.compare(ua, ub)
        else if (ua == ub) java.lang.Long.compare(ma, mb)
        else err(s"indeterminate duration order: $a $b")
      }
      else err(s"incomparable literals: $a $b")
    case _ => err(s"incomparable: $a $b")
  }

  /** Duration value of a duration-typed literal; invalid lexical → error. */
  private def durOf(l: Lit): (Long, Long) =
    Term.parseDuration(l.lexForm, l.datatype)
      .getOrElse(err(s"bad duration: ${l.lexForm}"))

  private def isStringy(l: Lit): Boolean =
    l.datatype == xsdString || l.datatype == rdfLangString

  /** RDF term equality / SPARQL '=' (value equality on literals). */
  def valueEquals(a: Term, b: Term): Boolean = (a, b) match {
    case (la: Lit, lb: Lit) =>
      if (numericTypes.contains(la.datatype) && numericTypes.contains(lb.datatype))
        numCompare(numOf(la), numOf(lb)) == 0
      else if (la.datatype == xsdDateTime && lb.datatype == xsdDateTime)
        dateTimeUs(la) == dateTimeUs(lb)
      else if (durationTypes.contains(la.datatype) && durationTypes.contains(lb.datatype))
        durOf(la) == durOf(lb) // value space: "P1Y" = "P12M"
      else if (la == lb) true
      else if (la.datatype == lb.datatype && la.lang == lb.lang) false
      else err(s"non-equal, incomparable literals: $a $b") // open-world =
    case _ => a == b
  }

  /** Total order for ORDER BY / MIN / MAX — never errors
    * (unbound < blank < IRI < literal; reference OrderPlan comparator,
    * MaterializedQueryPlan.swift:705-748). */
  def totalCompare(a: Term, b: Term): Int = {
    def rank(t: Term): Int = t match {
      case null => 0
      case _: BNode => 1
      case _: Iri => 2
      case _: Lit => 3
    }
    val r = Integer.compare(rank(a), rank(b))
    if (r != 0) r
    else a match {
      case null => 0
      case BNode(x) => x.compareTo(b.asInstanceOf[BNode].label)
      case Iri(x) => x.compareTo(b.asInstanceOf[Iri].value)
      case la: Lit =>
        val lb = b.asInstanceOf[Lit]
        try valueCompare(la, lb) catch {
          case _: EvalError =>
            val c = Option(la.datatype).getOrElse("").compareTo(Option(lb.datatype).getOrElse(""))
            if (c != 0) c else {
              val c2 = la.lexForm.compareTo(lb.lexForm)
              if (c2 != 0) c2
              else Option(la.lang).getOrElse("").compareTo(Option(lb.lang).getOrElse(""))
            }
        }
    }
  }

  def ebvOrErr(t: Term): Boolean = Term.ebv(t) match {
    case Some(b) => b
    case None => err(s"no EBV: $t")
  }

  // ---- the interpreter -----------------------------------------------------

  /** Evaluate; binding returns null for unbound. Throws EvalError on SPARQL error. */
  def eval(e: Expr, bind: String => Term, ctx: Ctx): Term =
    eval(e, bind, ctx, freshScope())

  def eval(e: Expr, bind: String => Term, ctx: Ctx, scope: BnodeScope): Term = e match {
    case EConst(t) => t
    case EVar(n) => bind(n) match { case null => err(s"unbound: ?$n"); case t => t }
    case EExists(_, _) => err("EXISTS must be rewritten to a join before eval")
    case ECall(fn, args) => call(fn, args, bind, ctx, scope)
  }

  private def ev(e: Expr, b: String => Term, c: Ctx)(implicit sc: BnodeScope): Term =
    eval(e, b, c, sc)

  private def strArg(t: Term): String = t match {
    case Lit(l, dt, _) if dt == xsdString || dt == rdfLangString => l
    case Iri(v) => v
    case _ => err(s"not a string: $t")
  }

  /** String-argument compatibility + result lang preservation
    * (reference Expression.swift:303-316). */
  private def strPair(a: Term, b: Term): (String, String) = (a, b) match {
    case (Lit(x, dta, la), Lit(y, dtb, lb))
        if (dta == xsdString || dta == rdfLangString) &&
           (dtb == xsdString || dtb == rdfLangString) =>
      if (lb != null && la != lb) err("incompatible string args") else (x, y)
    case _ => err("string args required")
  }

  private def likeStringResult(src: Term, s: String): Term = src match {
    case Lit(_, dt, lang) if dt == rdfLangString => Lit(s, rdfLangString, lang)
    case _ => Term.str(s)
  }

  private def regexFlags(f: String): Int = {
    var r = 0
    f.foreach {
      case 'i' => r |= java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.UNICODE_CASE
      case 's' => r |= java.util.regex.Pattern.DOTALL
      case 'm' => r |= java.util.regex.Pattern.MULTILINE
      case 'x' => r |= java.util.regex.Pattern.COMMENTS
      case 'q' => r |= java.util.regex.Pattern.LITERAL
      case o => err(s"bad regex flag: $o")
    }
    r
  }

  private def hash(algo: String, t: Term): Term = t match {
    case Lit(l, dt, lang) if dt == xsdString && (lang == null || lang.isEmpty) =>
      val md = java.security.MessageDigest.getInstance(algo)
      val d = md.digest(l.getBytes("UTF-8"))
      Term.str(d.map("%02x".format(_)).mkString)
    case _ => err(s"hash needs simple literal: $t")
  }

  private def dtField(t: Term): java.time.OffsetDateTime = t match {
    case Lit(l, dt, _) if dt == xsdDateTime =>
      try {
        if (l.endsWith("Z") || l.contains("+") || l.lastIndexOf('-') > 10)
          java.time.OffsetDateTime.parse(l)
        else java.time.LocalDateTime.parse(l).atOffset(java.time.ZoneOffset.UTC)
      } catch { case _: Exception => err(s"bad dateTime: $l") }
    case Lit(l, dt, _) if dt == xsdDate =>
      try java.time.LocalDate.parse(l).atStartOfDay.atOffset(java.time.ZoneOffset.UTC)
      catch { case _: Exception => err(s"bad date: $l") }
    case _ => err(s"not a dateTime: $t")
  }

  // scalastyle:off cyclomatic.complexity method.length
  private def call(fn: String, args: Seq[Expr], b: String => Term, c: Ctx,
      scope: BnodeScope): Term = {
    implicit val sc: BnodeScope = scope
    callImpl(fn, args, b, c)
  }

  private def callImpl(fn: String, args: Seq[Expr], b: String => Term, c: Ctx)(
      implicit scope: BnodeScope): Term = fn match {
    // logical — 3-valued with error short-circuit (Expression.swift:484-507)
    case "&&" =>
      val l = try Some(ebvOrErr(ev(args(0), b, c))) catch { case _: EvalError => None }
      val r = try Some(ebvOrErr(ev(args(1), b, c))) catch { case _: EvalError => None }
      (l, r) match {
        case (Some(false), _) | (_, Some(false)) => Term.bool(false)
        case (Some(true), Some(true)) => Term.bool(true)
        case _ => err("&& error")
      }
    case "||" =>
      val l = try Some(ebvOrErr(ev(args(0), b, c))) catch { case _: EvalError => None }
      val r = try Some(ebvOrErr(ev(args(1), b, c))) catch { case _: EvalError => None }
      (l, r) match {
        case (Some(true), _) | (_, Some(true)) => Term.bool(true)
        case (Some(false), Some(false)) => Term.bool(false)
        case _ => err("|| error")
      }
    case "!" => Term.bool(!ebvOrErr(ev(args(0), b, c)))

    // comparison
    case "=" => Term.bool(valueEquals(ev(args(0), b, c), ev(args(1), b, c)))
    case "!=" => Term.bool(!valueEquals(ev(args(0), b, c), ev(args(1), b, c)))
    case "<" => Term.bool(valueCompare(ev(args(0), b, c), ev(args(1), b, c)) < 0)
    case "<=" => Term.bool(valueCompare(ev(args(0), b, c), ev(args(1), b, c)) <= 0)
    case ">" => Term.bool(valueCompare(ev(args(0), b, c), ev(args(1), b, c)) > 0)
    case ">=" => Term.bool(valueCompare(ev(args(0), b, c), ev(args(1), b, c)) >= 0)
    case "sameterm" => Term.bool(ev(args(0), b, c) == ev(args(1), b, c))

    // arithmetic (promotion + div-by-zero error, Expression.swift:532-564)
    case "+" => numTerm(promote(numOf(ev(args(0), b, c)), numOf(ev(args(1), b, c)))(_ + _, _ + _, _ + _))
    case "-" =>
      val x = ev(args(0), b, c); val y = ev(args(1), b, c)
      (x, y) match {
        // XPath op:subtract-dateTimes: dateTime − dateTime → dayTimeDuration
        case (lx: Lit, ly: Lit)
            if lx.datatype == xsdDateTime && ly.datatype == xsdDateTime =>
          Term.dayTimeDurationOfMicros(dateTimeUs(lx) - dateTimeUs(ly))
        case _ => numTerm(promote(numOf(x), numOf(y))(_ - _, _ - _, _ - _))
      }
    case "*" => numTerm(promote(numOf(ev(args(0), b, c)), numOf(ev(args(1), b, c)))(_ * _, _ * _, _ * _))
    case "/" =>
      val l = numOf(ev(args(0), b, c)); val r = numOf(ev(args(1), b, c))
      (l, r) match {
        case (_, NInt(0)) => err("div by zero")
        case (_, NDec(z)) if z.signum == 0 => err("div by zero")
        case (NInt(x), NInt(y)) => numTerm(NDec(BigDecimal(x) / BigDecimal(y))) // int/int → decimal
        case _ => numTerm(promote(l, r)(_ / _, _ / _, _ / _))
      }
    case "neg" => numTerm(promote(NInt(0), numOf(ev(args(0), b, c)))(_ - _, _ - _, _ - _))

    // conditionals
    case "if" =>
      if (ebvOrErr(ev(args(0), b, c))) ev(args(1), b, c) else ev(args(2), b, c)
    case "coalesce" =>
      args.iterator.map(a => try ev(a, b, c) catch { case _: EvalError => null })
        .collectFirst { case t if t != null => t }
        .getOrElse(err("coalesce: all errored"))
    case "in" | "notin" =>
      val v = ev(args(0), b, c)
      var sawError = false
      val found = args.drop(1).exists { a =>
        try valueEquals(v, ev(a, b, c)) catch { case _: EvalError => sawError = true; false }
      }
      if (found) Term.bool(fn == "in")
      else if (sawError) err("IN error")
      else Term.bool(fn == "notin")

    // term tests / accessors
    case "bound" => args(0) match {
      case EVar(n) => Term.bool(b(n) != null)
      case _ => err("bound needs a variable")
    }
    case "isiri" | "isuri" => Term.bool(ev(args(0), b, c).isInstanceOf[Iri])
    case "isblank" => Term.bool(ev(args(0), b, c).isInstanceOf[BNode])
    case "isliteral" => Term.bool(ev(args(0), b, c).isInstanceOf[Lit])
    case "isnumeric" => Term.bool(Term.isNumeric(ev(args(0), b, c)))
    case "str" => Term.str(ev(args(0), b, c) match {
      case Iri(v) => v
      case Lit(l, _, _) => l
      case BNode(_) => err("STR of bnode")
    })
    case "lang" => ev(args(0), b, c) match {
      case Lit(_, _, lang) => Term.str(if (lang == null) "" else lang)
      case _ => err("LANG of non-literal")
    }
    case "datatype" => ev(args(0), b, c) match {
      case Lit(_, dt, lang) => Iri(if (lang != null && lang.nonEmpty) rdfLangString else dt)
      case _ => err("DATATYPE of non-literal")
    }
    case "langmatches" =>
      val tag = strArg(ev(args(0), b, c)).toLowerCase
      val range = strArg(ev(args(1), b, c)).toLowerCase
      Term.bool(if (range == "*") tag.nonEmpty
        else tag == range || tag.startsWith(range + "-"))

    // constructors
    case "iri" | "uri" => ev(args(0), b, c) match {
      case i: Iri => i
      case Lit(l, dt, lang) if dt == xsdString && (lang == null) => Iri(l)
      case t => err(s"IRI($t)")
    }
    case "strdt" =>
      val l = ev(args(0), b, c) match {
        case Lit(x, dt, lang) if dt == xsdString && lang == null => x
        case t => err(s"STRDT($t)")
      }
      Lit(l, strArg(ev(args(1), b, c)), null)
    case "strlang" =>
      val l = ev(args(0), b, c) match {
        case Lit(x, dt, lang) if dt == xsdString && lang == null => x
        case t => err(s"STRLANG($t)")
      }
      Term.langStr(l, strArg(ev(args(1), b, c)))
    case "bnode" =>
      if (args.isEmpty) scope.fresh()
      else scope.labeled(strArg(ev(args(0), b, c)))
    case "uuid" => Iri("urn:uuid:" + java.util.UUID.randomUUID.toString)
    case "struuid" => Term.str(java.util.UUID.randomUUID.toString)

    // strings (Expression.swift:318-430)
    case "strlen" => Term.int(strArg(ev(args(0), b, c)).codePointCount(0,
      strArg(ev(args(0), b, c)).length).toLong)
    case "ucase" =>
      val t = ev(args(0), b, c); likeStringResult(t, strArg(t).toUpperCase)
    case "lcase" =>
      val t = ev(args(0), b, c); likeStringResult(t, strArg(t).toLowerCase)
    case "concat" =>
      val ts = args.map(a => ev(a, b, c))
      val langs = ts.map { case Lit(_, dt, lang) if dt == rdfLangString => lang
        case Lit(_, dt, _) if dt == xsdString => null
        case t => err(s"CONCAT($t)") }.distinct
      val s = ts.map { case Lit(l, _, _) => l; case t => err(s"CONCAT($t)") }.mkString
      if (langs.size == 1 && langs.head != null) Term.langStr(s, langs.head) else Term.str(s)
    case "contains" =>
      val (x, y) = strPair(ev(args(0), b, c), ev(args(1), b, c)); Term.bool(x.contains(y))
    case "strstarts" =>
      val (x, y) = strPair(ev(args(0), b, c), ev(args(1), b, c)); Term.bool(x.startsWith(y))
    case "strends" =>
      val (x, y) = strPair(ev(args(0), b, c), ev(args(1), b, c)); Term.bool(x.endsWith(y))
    case "strbefore" =>
      val src = ev(args(0), b, c)
      val (x, y) = strPair(src, ev(args(1), b, c))
      val i = x.indexOf(y)
      if (y.isEmpty) likeStringResult(src, "")
      else if (i < 0) Term.str("") else likeStringResult(src, x.substring(0, i))
    case "strafter" =>
      val src = ev(args(0), b, c)
      val (x, y) = strPair(src, ev(args(1), b, c))
      val i = x.indexOf(y)
      if (y.isEmpty) likeStringResult(src, x)
      else if (i < 0) Term.str("") else likeStringResult(src, x.substring(i + y.length))
    case "substr" =>
      val src = ev(args(0), b, c)
      val s = strArg(src)
      val start = numOf(ev(args(1), b, c)) match { case NInt(v) => v.toInt; case n => math.round(n.d).toInt }
      val from = math.max(start - 1, 0) // SPARQL SUBSTR is 1-based, codepoints
      val cps = s.codePoints.toArray
      val end = if (args.size > 2) {
        val len = numOf(ev(args(2), b, c)) match { case NInt(v) => v.toInt; case n => math.round(n.d).toInt }
        math.min(math.max(start - 1 + len, from), cps.length)
      } else cps.length
      val out = if (from >= cps.length) "" else new String(cps, from, end - from)
      likeStringResult(src, out)
    case "replace" =>
      val src = ev(args(0), b, c)
      val s = strArg(src)
      val pat = strArg(ev(args(1), b, c))
      val rep = strArg(ev(args(2), b, c))
      val flags = if (args.size > 3) regexFlags(strArg(ev(args(3), b, c))) else 0
      val p = java.util.regex.Pattern.compile(pat, flags)
      likeStringResult(src, p.matcher(s).replaceAll(rep))
    case "regex" =>
      val s = strArg(ev(args(0), b, c))
      val pat = strArg(ev(args(1), b, c))
      val flags = if (args.size > 2) regexFlags(strArg(ev(args(2), b, c))) else 0
      Term.bool(java.util.regex.Pattern.compile(pat, flags).matcher(s).find())
    case "encode_for_uri" =>
      val s = strArg(ev(args(0), b, c))
      val sb = new StringBuilder
      s.getBytes("UTF-8").foreach { byt =>
        val ch = byt.toChar
        if (ch.isLetterOrDigit && byt >= 0 || "-_.~".contains(ch)) sb.append(ch)
        else sb.append("%%%02X".format(byt & 0xFF))
      }
      Term.str(sb.toString)

    // numeric (Expression.swift:432-455)
    case "abs" => numTerm(numOf(ev(args(0), b, c)) match {
      case NInt(v) => NInt(math.abs(v)); case NDec(v) => NDec(v.abs)
      case NFlt(v) => NFlt(math.abs(v)); case NDbl(v) => NDbl(math.abs(v))
    })
    case "round" => numTerm(numOf(ev(args(0), b, c)) match {
      case n @ NInt(_) => n
      // XPath fn:round: ties go toward POSITIVE infinity (-1.5 → -1), which
      // is floor(x + 0.5) — not HALF_UP (that sends -1.5 to -2)
      case NDec(v) => NDec((v + 0.5).setScale(0, BigDecimal.RoundingMode.FLOOR))
      case NFlt(v) => NFlt(math.round(v).toFloat); case NDbl(v) => NDbl(math.round(v).toDouble)
    })
    case "ceil" => numTerm(numOf(ev(args(0), b, c)) match {
      case n @ NInt(_) => n
      case NDec(v) => NDec(v.setScale(0, BigDecimal.RoundingMode.CEILING))
      case NFlt(v) => NFlt(math.ceil(v).toFloat); case NDbl(v) => NDbl(math.ceil(v))
    })
    case "floor" => numTerm(numOf(ev(args(0), b, c)) match {
      case n @ NInt(_) => n
      case NDec(v) => NDec(v.setScale(0, BigDecimal.RoundingMode.FLOOR))
      case NFlt(v) => NFlt(math.floor(v).toFloat); case NDbl(v) => NDbl(math.floor(v))
    })
    case "rand" => Term.dbl(scala.util.Random.nextDouble())

    // date/time (Expression.swift:115-176)
    case "now" => Term.dateTimeMicros(c.nowEpochUs)
    case "year" => Term.int(dtField(ev(args(0), b, c)).getYear.toLong)
    case "month" => Term.int(dtField(ev(args(0), b, c)).getMonthValue.toLong)
    case "day" => Term.int(dtField(ev(args(0), b, c)).getDayOfMonth.toLong)
    case "hours" => Term.int(dtField(ev(args(0), b, c)).getHour.toLong)
    case "minutes" => Term.int(dtField(ev(args(0), b, c)).getMinute.toLong)
    case "seconds" =>
      val d = dtField(ev(args(0), b, c))
      Term.dec(BigDecimal(d.getSecond) + BigDecimal(d.getNano) / BigDecimal(1000000000L))
    case "timezone" =>
      val t = ev(args(0), b, c)
      t match {
        case Lit(l, dt, _) if dt == xsdDateTime && (l.endsWith("Z") || l.contains("+") ||
            l.lastIndexOf('-') > 10) =>
          val off = dtField(t).getOffset.getTotalSeconds
          val s = if (off == 0) "PT0S" else {
            val sign = if (off < 0) "-" else ""
            val h = math.abs(off) / 3600; val m = (math.abs(off) % 3600) / 60
            sign + "PT" + (if (h > 0) s"${h}H" else "") + (if (m > 0) s"${m}M" else
              if (h == 0) "0S" else "")
          }
          Lit(s, XSD + "dayTimeDuration", null)
        case _ => err("TIMEZONE: no timezone")
      }
    case "tz" =>
      val t = ev(args(0), b, c)
      t match {
        case Lit(l, dt, _) if dt == xsdDateTime =>
          if (l.endsWith("Z")) Term.str("Z")
          else if (l.contains("+") || l.lastIndexOf('-') > 10) {
            val off = dtField(t).getOffset
            Term.str(off.getId)
          } else Term.str("")
        case _ => err("TZ")
      }

    // hashes (Expression.swift:207-238)
    case "md5" => hash("MD5", ev(args(0), b, c))
    case "sha1" => hash("SHA-1", ev(args(0), b, c))
    case "sha256" => hash("SHA-256", ev(args(0), b, c))
    case "sha384" => hash("SHA-384", ev(args(0), b, c))
    case "sha512" => hash("SHA-512", ev(args(0), b, c))

    // casts (Expression.swift:602-748)
    case "xsd:integer" => castInteger(ev(args(0), b, c))
    case "xsd:decimal" => castDecimal(ev(args(0), b, c))
    case "xsd:float" => castFloatDouble(ev(args(0), b, c), xsdFloat)
    case "xsd:double" => castFloatDouble(ev(args(0), b, c), xsdDouble)
    case "xsd:boolean" => castBoolean(ev(args(0), b, c))
    case "xsd:string" => Term.str(ev(args(0), b, c) match {
      case Iri(v) => v; case Lit(l, _, _) => l; case _ => err("cast of bnode")
    })
    case "xsd:datetime" => ev(args(0), b, c) match {
      case l @ Lit(_, dt, _) if dt == xsdDateTime => l
      case Lit(s, dt, _) if dt == xsdString || dt == xsdDate =>
        val lit = Lit(if (dt == xsdDate) s + "T00:00:00Z" else s, xsdDateTime, null)
        dtField(lit); lit // validate
      case t => err(s"cast to dateTime: $t")
    }
    case "xsd:date" => ev(args(0), b, c) match {
      case l @ Lit(_, dt, _) if dt == xsdDate => l
      case Lit(s, dt, _) if dt == xsdString =>
        try { java.time.LocalDate.parse(s); Lit(s, xsdDate, null) }
        catch { case _: Exception => err(s"cast to date: $s") }
      case l @ Lit(s, dt, _) if dt == xsdDateTime => Lit(s.substring(0, 10), xsdDate, null)
      case t => err(s"cast to date: $t")
    }

    case other =>
      c.extensions.get(other) match {
        case Some(f) => f(args.map(a => ev(a, b, c)))
        case None => err(s"unknown function: $other")
      }
  }
  // scalastyle:on

  private def castInteger(t: Term): Term = t match {
    case Lit(l, dt, _) =>
      if (dt == xsdBoolean) Term.int(if (l == "true" || l == "1") 1 else 0)
      else if (numericTypes.contains(dt)) numOf(t) match {
        case NInt(v) => Term.int(v)
        case n => Term.int(n.d.toLong)
      }
      else if (dt == xsdString)
        try Term.int(java.lang.Long.parseLong(l.trim))
        catch { case _: NumberFormatException =>
          try Term.int(BigDecimal(l.trim).toLongExact)
          catch { case _: Exception => err(s"cast to integer: $l") } }
      else err(s"cast to integer: $t")
    case _ => err("cast of non-literal")
  }

  private def castDecimal(t: Term): Term = t match {
    case Lit(l, dt, _) =>
      if (dt == xsdBoolean) Term.dec(BigDecimal(if (l == "true" || l == "1") 1 else 0))
      else if (numericTypes.contains(dt) || dt == xsdString)
        try Term.dec(BigDecimal(l.trim))
        catch { case _: Exception => err(s"cast to decimal: $l") }
      else err(s"cast to decimal: $t")
    case _ => err("cast of non-literal")
  }

  private def castFloatDouble(t: Term, target: String): Term = t match {
    case Lit(l, dt, _) =>
      if (dt == xsdBoolean) Lit(if (l == "true" || l == "1") "1.0" else "0.0", target, null)
      else if (numericTypes.contains(dt) || dt == xsdString)
        try {
          val d = java.lang.Double.parseDouble(l.trim)
          if (target == xsdFloat) Lit(d.toFloat.toString, target, null)
          else Lit(Term.fmtDouble(d), target, null)
        } catch { case _: Exception => err(s"cast to $target: $l") }
      else err(s"cast to $target: $t")
    case _ => err("cast of non-literal")
  }

  private def castBoolean(t: Term): Term = t match {
    case Lit(l, dt, _) =>
      if (dt == xsdBoolean) t
      else if (dt == xsdString && (l == "true" || l == "false" || l == "1" || l == "0"))
        Term.bool(l == "true" || l == "1")
      else if (numericTypes.contains(dt)) Term.bool(numOf(t).d != 0)
      else err(s"cast to boolean: $l")
    case _ => err("cast of non-literal")
  }
}
