package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algebra._
import graft.engine.{EvalError, ExprEval}
import graft.model._

/** W3C-style unit tests for the expression interpreter — error propagation, EBV,
  * 3-valued logic, string/lang semantics, promotion, casts (mirrors the reference's
  * expression test intent, Tests/KineoTests/QueryEvaluation.swift).
  */
class ExprEvalSpec extends AnyFunSuite {
  val ctx = ExprEval.Ctx(nowEpochUs = 820497845000000L) // 1996-01-01T12:04:05Z
  def ev(e: Expr, b: Map[String, Term] = Map.empty): Term =
    ExprEval.eval(e, b.getOrElse(_, null), ctx)
  def call(fn: String, args: Expr*): Expr = ECall(fn, args)
  def c(t: Term): Expr = EConst(t)
  def s(x: String): Expr = c(Term.str(x))
  def i(x: Long): Expr = c(Term.int(x))
  def d(x: Double): Expr = c(Term.dbl(x))
  def isErr(e: => Term): Boolean =
    try { e; false } catch { case _: EvalError => true }

  test("three-valued logic with errors (Expression.swift:484-507 tables)") {
    val T = c(Term.bool(true)); val F = c(Term.bool(false))
    val E = EVar("missing") // unbound → error
    assert(ev(call("&&", F, E)) == Term.bool(false)) // false && error = false
    assert(ev(call("&&", E, F)) == Term.bool(false))
    assert(isErr(ev(call("&&", T, E))))              // true && error = error
    assert(ev(call("||", T, E)) == Term.bool(true))  // true || error = true
    assert(ev(call("||", E, T)) == Term.bool(true))
    assert(isErr(ev(call("||", F, E))))              // false || error = error
    assert(ev(call("!", F)) == Term.bool(true))
  }

  test("EBV rules") {
    assert(Term.ebv(Term.str("")) == Some(false))
    assert(Term.ebv(Term.str("x")) == Some(true))
    assert(Term.ebv(Term.int(0)) == Some(false))
    assert(Term.ebv(Term.dbl(0.5)) == Some(true))
    assert(Term.ebv(Lit("notanumber", Term.xsdInteger, null)) == Some(false))
    assert(Term.ebv(Iri("http://x")) == None) // type error
  }

  test("numeric promotion and division (int/int → decimal)") {
    assert(ev(call("+", i(2), i(3))) == Term.int(5))
    val mixed = ev(call("+", i(2), d(0.5)))
    assert(mixed.asInstanceOf[Lit].datatype == Term.xsdDouble)
    val div = ev(call("/", i(7), i(2)))
    assert(div.asInstanceOf[Lit].datatype == Term.xsdDecimal)
    assert(div.lex == "3.5")
    assert(isErr(ev(call("/", i(1), i(0)))))
    val dec = ev(call("+", c(Term.dec(BigDecimal("1.10"))), c(Term.dec(BigDecimal("2.05")))))
    assert(dec.asInstanceOf[Lit].datatype == Term.xsdDecimal && dec.lex == "3.15")
  }

  test("value comparison: cross-numeric, strings, incomparable errors") {
    assert(ev(call("<", i(2), d(2.5))) == Term.bool(true))
    assert(ev(call("=", i(2), c(Term.dec(BigDecimal("2.0"))))) == Term.bool(true))
    assert(ev(call("<", s("abc"), s("abd"))) == Term.bool(true))
    assert(isErr(ev(call("<", s("abc"), i(5)))))   // incomparable
    assert(isErr(ev(call("=", s("x"), i(5)))))     // open-world equality error
    assert(ev(call("!=", c(Iri("urn:a")), c(Iri("urn:b")))) == Term.bool(true))
    assert(ev(call("=",
      c(Lit("2020-01-01T00:00:00Z", Term.xsdDateTime, null)),
      c(Lit("2020-01-01T01:00:00+01:00", Term.xsdDateTime, null)))) == Term.bool(true))
  }

  test("string functions preserve language tags (Expression.swift:303-316)") {
    val en = c(Term.langStr("Hello World", "en"))
    assert(ev(call("ucase", en)) == Term.langStr("HELLO WORLD", "en"))
    assert(ev(call("substr", en, i(1), i(5))) == Term.langStr("Hello", "en"))
    assert(ev(call("strbefore", en, s(" "))) == Term.langStr("Hello", "en"))
    assert(ev(call("strafter", en, s(" "))) == Term.langStr("World", "en"))
    assert(ev(call("concat", en, c(Term.langStr("!", "en")))) == Term.langStr("Hello World!", "en"))
    // mixed langs in concat → plain literal
    assert(ev(call("concat", en, c(Term.langStr("!", "fr")))) == Term.str("Hello World!"))
    // incompatible: fr arg2 against en arg1 errors for contains
    assert(isErr(ev(call("contains", en, c(Term.langStr("o", "fr"))))))
    assert(ev(call("strlen", s("日本語"))) == Term.int(3)) // codepoints
  }

  test("substr edge cases (1-based, codepoints)") {
    assert(ev(call("substr", s("hello"), i(2))) == Term.str("ello"))
    assert(ev(call("substr", s("hello"), i(0), i(3))) == Term.str("he")) // per xpath
    assert(ev(call("substr", s("hello"), i(99))) == Term.str(""))
  }

  test("regex and replace with flags") {
    assert(ev(call("regex", s("Spark"), s("^sp"), s("i"))) == Term.bool(true))
    assert(ev(call("regex", s("a\nb"), s("a.b"), s("s"))) == Term.bool(true))
    assert(ev(call("replace", s("abcab"), s("a"), s("X"))) == Term.str("XbcXb"))
    assert(ev(call("replace", s("aAa"), s("a"), s("-"), s("i"))) == Term.str("---"))
    assert(isErr(ev(call("regex", s("x"), s("x"), s("z"))))) // bad flag
  }

  test("term accessors and constructors") {
    assert(ev(call("datatype", i(5))) == Iri(Term.xsdInteger))
    assert(ev(call("datatype", c(Term.langStr("x", "en")))) == Iri(Term.rdfLangString))
    // language tags normalize to lowercase at term construction (RDF 1.1 §3.3)
    assert(ev(call("lang", c(Term.langStr("x", "en-GB")))) == Term.str("en-gb"))
    assert(ev(call("lang", s("x"))) == Term.str(""))
    assert(ev(call("langmatches", s("en-GB"), s("en"))) == Term.bool(true))
    assert(ev(call("langmatches", s("fr"), s("en"))) == Term.bool(false))
    assert(ev(call("langmatches", s("fr"), s("*"))) == Term.bool(true))
    assert(ev(call("iri", s("urn:x"))) == Iri("urn:x"))
    assert(ev(call("strdt", s("5"), s(Term.xsdInteger))) == Term.int(5))
    assert(ev(call("strlang", s("chat"), s("FR"))) == Term.langStr("chat", "fr"))
    assert(ev(call("isnumeric", i(1))) == Term.bool(true))
    assert(ev(call("isiri", c(Iri("urn:x")))) == Term.bool(true))
    assert(ev(call("sameterm", i(5), i(5))) == Term.bool(true))
    // sameTerm is syntactic: 5 vs 5.0 differ
    assert(ev(call("sameterm", i(5), c(Term.dec(BigDecimal(5))))) == Term.bool(false))
    assert(ev(call("str", c(Iri("urn:x")))) == Term.str("urn:x"))
  }

  test("bound / if / coalesce / in error semantics") {
    val b = Map("x" -> (Term.int(1): Term))
    assert(ExprEval.eval(call("bound", EVar("x")), b.getOrElse(_, null), ctx) == Term.bool(true))
    assert(ev(call("bound", EVar("y"))) == Term.bool(false))
    assert(ev(call("if", c(Term.bool(true)), s("a"), EVar("zzz"))) == Term.str("a"))
    assert(ev(call("coalesce", EVar("zzz"), s("fallback"))) == Term.str("fallback"))
    assert(isErr(ev(call("coalesce", EVar("zzz")))))
    assert(ev(call("in", i(2), i(1), i(2))) == Term.bool(true))
    assert(isErr(ev(call("in", i(2), i(1), EVar("zzz"))))) // no match + error → error
    assert(ev(call("in", i(1), i(1), EVar("zzz"))) == Term.bool(true)) // match wins
    assert(ev(call("notin", i(9), i(1), i(2))) == Term.bool(true))
  }

  test("date/time accessors + timezone") {
    val dt = c(Lit("2011-01-10T14:45:13.815-05:00", Term.xsdDateTime, null))
    assert(ev(call("year", dt)) == Term.int(2011))
    assert(ev(call("month", dt)) == Term.int(1))
    assert(ev(call("day", dt)) == Term.int(10))
    assert(ev(call("hours", dt)) == Term.int(14))
    assert(ev(call("minutes", dt)) == Term.int(45))
    assert(ev(call("seconds", dt)).lex == "13.815")
    assert(ev(call("tz", dt)) == Term.str("-05:00"))
    assert(ev(call("timezone", dt)) ==
      Lit("-PT5H", Term.XSD + "dayTimeDuration", null))
    val z = c(Lit("2011-01-10T14:45:13Z", Term.xsdDateTime, null))
    assert(ev(call("tz", z)) == Term.str("Z"))
    assert(ev(call("timezone", z)) == Lit("PT0S", Term.XSD + "dayTimeDuration", null))
    assert(ev(call("now")).asInstanceOf[Lit].datatype == Term.xsdDateTime)
    assert(ev(call("now")) == ev(call("now"))) // fixed per query
  }

  test("hashes match known vectors") {
    assert(ev(call("md5", s("abc"))) == Term.str("900150983cd24fb0d6963f7d28e17f72"))
    assert(ev(call("sha1", s("abc"))) ==
      Term.str("a9993e364706816aba3e25717850c26c9cd0d89d"))
    assert(ev(call("sha256", s("abc"))) ==
      Term.str("ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"))
    assert(isErr(ev(call("md5", i(5))))) // simple literals only
  }

  test("casts validate and canonicalize") {
    assert(ev(call("xsd:integer", s(" 42 "))) == Term.int(42))
    assert(ev(call("xsd:integer", c(Term.bool(true)))) == Term.int(1))
    assert(ev(call("xsd:integer", d(3.9))) == Term.int(3)) // truncation
    assert(isErr(ev(call("xsd:integer", s("abc")))))
    assert(ev(call("xsd:boolean", s("1"))) == Term.bool(true))
    assert(isErr(ev(call("xsd:boolean", s("maybe")))))
    assert(ev(call("xsd:double", i(2))).asInstanceOf[Lit].datatype == Term.xsdDouble)
    assert(ev(call("xsd:date", c(Lit("2020-05-06T01:02:03Z", Term.xsdDateTime, null)))) ==
      Lit("2020-05-06", Term.xsdDate, null))
    assert(isErr(ev(call("xsd:date", s("not-a-date")))))
  }

  test("total order: unbound < blank < iri < literal; numeric by value") {
    import ExprEval.totalCompare
    assert(totalCompare(null, BNode("a")) < 0)
    assert(totalCompare(BNode("a"), Iri("urn:z")) < 0)
    assert(totalCompare(Iri("urn:z"), Term.int(1)) < 0)
    assert(totalCompare(Term.int(2), Term.dbl(10.0)) < 0)
    assert(totalCompare(Term.str("a"), Term.str("b")) < 0)
    // incomparable literals fall back to (datatype, lex) — deterministic
    assert(totalCompare(Term.str("5"), Term.int(5)) != 0)
  }

  test("xsd:duration value space: =/< per XSD, restricted types, errors") {
    def dur(l: String, dt: String = Term.xsdDuration): Expr = c(Lit(l, dt, null))
    // value equality across lexical forms (months, micros)
    assert(ev(call("=", dur("P1Y"), dur("P12M"))) == Term.bool(true))
    assert(ev(call("=", dur("PT1H", Term.xsdDayTimeDuration),
      dur("PT3600S", Term.xsdDayTimeDuration))) == Term.bool(true))
    assert(ev(call("=", dur("P1Y"), dur("P13M"))) == Term.bool(false))
    // order: same month component → compare day/time remainder, and vice versa
    assert(ev(call("<", dur("P1D"), dur("P2D"))) == Term.bool(true))
    assert(ev(call("<", dur("P11M", Term.xsdYearMonthDuration),
      dur("P1Y", Term.xsdYearMonthDuration))) == Term.bool(true))
    assert(ev(call("<", dur("P1Y1D"), dur("P1Y2D"))) == Term.bool(true))
    assert(ev(call("<", dur("-PT1M", Term.xsdDayTimeDuration),
      dur("PT0S", Term.xsdDayTimeDuration))) == Term.bool(true))
    // indeterminate order (month vs day tradeoff) is an error, not false
    assert(isErr(ev(call("<", dur("P1M"), dur("P30D")))))
    // fractional seconds
    assert(ev(call("=", dur("PT1.5S"), dur("PT1.500S"))) == Term.bool(true))
    // restricted types reject foreign fields; malformed forms error on use
    assert(isErr(ev(call("=", dur("P1D", Term.xsdYearMonthDuration), dur("P1D")))))
    assert(isErr(ev(call("=", dur("P1Y", Term.xsdDayTimeDuration), dur("P1Y")))))
    assert(isErr(ev(call("=", dur("P"), dur("P")))))
    assert(isErr(ev(call("=", dur("P1YT"), dur("P1YT")))))
    // duration vs non-duration comparison is an error
    assert(isErr(ev(call("<", dur("P1D"), i(86400)))))
  }

  test("dateTime subtraction yields canonical xsd:dayTimeDuration") {
    def dt(l: String): Expr = c(Lit(l, Term.xsdDateTime, null))
    assert(ev(call("-", dt("2020-05-07T01:02:03Z"), dt("2020-05-06T01:02:03Z"))) ==
      Lit("P1D", Term.xsdDayTimeDuration, null))
    assert(ev(call("-", dt("2020-05-06T02:03:04.5Z"), dt("2020-05-06T01:02:03Z"))) ==
      Lit("PT1H1M1.5S", Term.xsdDayTimeDuration, null))
    assert(ev(call("-", dt("2020-05-06T01:02:03Z"), dt("2020-05-07T01:02:03Z"))) ==
      Lit("-P1D", Term.xsdDayTimeDuration, null))
    assert(ev(call("-", dt("2020-05-06T01:02:03Z"), dt("2020-05-06T01:02:03Z"))) ==
      Lit("PT0S", Term.xsdDayTimeDuration, null))
    // offsets honored: 14:04+02:00 is the same instant as 12:04Z
    assert(ev(call("-", dt("2020-05-06T14:04:05+02:00"), dt("2020-05-06T12:04:05Z"))) ==
      Lit("PT0S", Term.xsdDayTimeDuration, null))
    // subtraction result is itself comparable
    assert(ev(call("<",
      call("-", dt("2020-05-06T02:00:00Z"), dt("2020-05-06T01:00:00Z")),
      call("-", dt("2020-05-06T04:00:00Z"), dt("2020-05-06T01:00:00Z")))) ==
      Term.bool(true))
  }

  test("duration ordering via value comparison is total on each restricted type") {
    // W3C-style ordering probe: dayTimeDurations sort by micros
    val ds = Seq("PT2M", "-PT1H", "PT90S", "P1D", "PT0S")
      .map(l => Lit(l, Term.xsdDayTimeDuration, null))
    val sorted = ds.sortWith((a, b) => ExprEval.valueCompare(a, b) < 0).map(_.lexForm)
    assert(sorted == Seq("-PT1H", "PT0S", "PT90S", "PT2M", "P1D"))
    val yms = Seq("P13M", "-P1M", "P1Y", "P0M")
      .map(l => Lit(l, Term.xsdYearMonthDuration, null))
    val sortedY = yms.sortWith((a, b) => ExprEval.valueCompare(a, b) < 0).map(_.lexForm)
    assert(sortedY == Seq("-P1M", "P0M", "P1Y", "P13M"))
  }

  test("nondeterministic functions produce well-formed terms") {
    val u = ev(call("uuid"))
    assert(u.isInstanceOf[Iri] && u.lex.startsWith("urn:uuid:"))
    val su = ev(call("struuid"))
    assert(su.asInstanceOf[Lit].lexForm.length == 36)
    assert(ev(call("bnode")).isInstanceOf[BNode])
    assert(ev(call("bnode", s("lbl"))).isInstanceOf[BNode])
    val r = ev(call("rand"))
    val dv = r.asInstanceOf[Lit].lexForm.toDouble
    assert(dv >= 0.0 && dv < 1.0)
  }

  test("BNODE per-row label scoping (NextRowPlan semantics)") {
    // same scope (= same solution row): BNODE("x") co-refers; BNODE() stays fresh
    val row1 = new ExprEval.BnodeScope(7L, 1, 1)
    val a = ExprEval.eval(call("bnode", s("x")), Map.empty[String, Term].getOrElse(_, null), ctx, row1)
    val b = ExprEval.eval(call("bnode", s("x")), Map.empty[String, Term].getOrElse(_, null), ctx, row1)
    assert(a == b, "same row, same label → same bnode")
    val f1 = ExprEval.eval(call("bnode"), Map.empty[String, Term].getOrElse(_, null), ctx, row1)
    val f2 = ExprEval.eval(call("bnode"), Map.empty[String, Term].getOrElse(_, null), ctx, row1)
    assert(f1 != f2, "argless BNODE is fresh per call")
    // different scope (= different row): different bnodes for the same label
    val row2 = new ExprEval.BnodeScope(8L, 1, 1)
    val a2 = ExprEval.eval(call("bnode", s("x")), Map.empty[String, Term].getOrElse(_, null), ctx, row2)
    assert(a != a2, "different rows → different bnodes")
    // distinct labels in one row stay distinct
    val y = ExprEval.eval(call("bnode", s("y")), Map.empty[String, Term].getOrElse(_, null), ctx, row1)
    assert(a != y)
  }

  test("encode_for_uri") {
    assert(ev(call("encode_for_uri", s("Los Angeles"))) == Term.str("Los%20Angeles"))
    assert(ev(call("encode_for_uri", s("a~b_c-d.e"))) == Term.str("a~b_c-d.e"))
  }
}
