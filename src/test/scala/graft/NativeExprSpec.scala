package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.algebra._
import graft.engine.{EvalError, ExprEval, NativeExpr, TV}
import graft.model._

/** Differential test: the native Catalyst compilation of every supported scalar
  * expression must agree with the reference interpreter [[ExprEval]] on a full
  * matrix of term pairs (errors ↔ SQL NULL). Known, spec-legal divergences
  * (decimal precision beyond 18 fractional digits) are tolerated via
  * value-comparison for decimal results.
  */
class NativeExprSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark
  val ctx = ExprEval.Ctx(nowEpochUs = 820497845000000L)

  val terms: Seq[Term] = Seq(
    null,
    Iri("http://example.org/x"),
    Iri("urn:t:customer:1"),
    BNode("b1"),
    Term.str(""),
    Term.str("abc"),
    Term.str("abcdef#42"),
    Term.str("42"),
    Term.str(" 42 "),
    Term.str("4.5"),
    Term.str("true"),
    Term.langStr("abc", "en"),
    Term.langStr("abc", "fr"),
    Term.int(0),
    Term.int(5),
    Term.int(-3),
    Term.int(42),
    Term.dec(BigDecimal("5.5")),
    Term.dec(BigDecimal("-2.5")),
    Term.dbl(2.5),
    Term.dbl(0.0),
    Term.dbl(-2.5),
    Lit("1.5", Term.xsdFloat, null),
    Term.bool(true),
    Term.bool(false),
    Lit("2024-01-02", Term.xsdDate, null),
    Lit("2023-12-31", Term.xsdDate, null),
    Lit("1996-01-01T12:04:05Z", Term.xsdDateTime, null),
    Lit("1996-01-01T12:04:05", Term.xsdDateTime, null),
    Lit("1996-01-01T14:04:05+02:00", Term.xsdDateTime, null),
    Lit("bad", Term.xsdInteger, null), // malformed numeric
    Lit("x", "urn:custom:dt", null),   // unknown datatype
    // durations: value space (months, micros); P1Y = P12M across lexical
    // forms, P1M1D vs P1Y is indeterminate (error), restricted types reject
    // foreign fields, "P" is malformed
    Lit("P1Y", Term.xsdDuration, null),
    Lit("P12M", Term.xsdDuration, null),
    Lit("P1M1D", Term.xsdDuration, null),
    Lit("P1DT2H3M4.5S", Term.xsdDuration, null),
    Lit("P2M", Term.xsdYearMonthDuration, null),
    Lit("PT1H", Term.xsdDayTimeDuration, null),
    Lit("PT3600S", Term.xsdDayTimeDuration, null),
    Lit("-PT1M", Term.xsdDayTimeDuration, null),
    Lit("P1Y", Term.xsdDayTimeDuration, null), // invalid for restricted type
    Lit("P", Term.xsdDuration, null))          // malformed

  lazy val pairsDf = {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("j", IntegerType),
      StructField("a", TermRow.schema), StructField("b", TermRow.schema)))
    val rows = for {
      (a, i) <- terms.zipWithIndex
      (b, j) <- terms.zipWithIndex
    } yield Row(i, j, TermRow.toRow(a), TermRow.toRow(b))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  private def isDecimalLit(t: Term): Boolean = t match {
    case Lit(_, dt, _) => dt == Term.xsdDecimal
    case _ => false
  }

  /** Exact term equality, except decimal results compare by value (precision
    * divergence: BigDecimal MathContext vs DECIMAL(38,18)). */
  private def agree(exp: Term, got: Term): Boolean =
    (exp, got) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (e: Lit, g: Lit) if isDecimalLit(e) && isDecimalLit(g) =>
        val (x, y) = (BigDecimal(e.lexForm), BigDecimal(g.lexForm))
        (x - y).abs <= (x.abs.max(y.abs).max(BigDecimal(1)) * BigDecimal("1e-15"))
      case _ => exp == got
    }

  private def check(name: String, e: Expr): Unit = {
    val viewMap = Map("a" -> col("a"), "b" -> col("b"))
    val native = NativeExpr.termColumn(e, viewMap.get, ctx.nowEpochUs)
    assert(native.isDefined, s"$name: expected native support")
    val rows = native.get.applyTo(pairsDf)
      .select(col("i"), col("j"), native.get.result.as("out")).collect()
    rows.foreach { r =>
      val a = terms(r.getInt(0)); val b = terms(r.getInt(1))
      val bind: String => Term = { case "a" => a; case "b" => b; case _ => null }
      val exp: Term =
        try ExprEval.eval(e, bind, ctx) catch { case _: EvalError => null }
      val got: Term = if (r.isNullAt(2)) null else TV.toTerm(r.getStruct(2))
      assert(agree(exp, got),
        s"$name mismatch on a=$a b=$b: interp=$exp native=$got")
    }
  }

  private def c2(fn: String): Expr = ECall(fn, Seq(EVar("a"), EVar("b")))
  private def c1(fn: String, extra: Expr*): Expr = ECall(fn, EVar("a") +: extra)

  test("comparisons match interpreter") {
    Seq("=", "!=", "<", "<=", ">", ">=", "sameterm").foreach(f => check(f, c2(f)))
  }

  test("logical and EBV match interpreter") {
    check("&&", c2("&&")); check("||", c2("||")); check("!", c1("!"))
  }

  test("arithmetic matches interpreter") {
    Seq("+", "-", "*", "/").foreach(f => check(f, c2(f)))
    check("neg", c1("neg"))
  }

  test("numeric unary functions match interpreter") {
    Seq("abs", "round", "ceil", "floor").foreach(f => check(f, c1(f)))
  }

  test("term accessors and tests match interpreter") {
    Seq("str", "lang", "datatype", "isiri", "isblank", "isliteral", "isnumeric",
      "iri").foreach(f => check(f, c1(f)))
    check("bound", ECall("bound", Seq(EVar("a"))))
  }

  test("string functions match interpreter") {
    Seq("strlen", "ucase", "lcase").foreach(f => check(f, c1(f)))
    Seq("concat", "contains", "strstarts", "strends", "strbefore", "strafter",
      "langmatches").foreach(f => check(f, c2(f)))
    check("substr2", c1("substr", EConst(Term.int(2))))
    check("substr23", c1("substr", EConst(Term.int(2)), EConst(Term.int(3))))
    check("substr_neg", c1("substr", EConst(Term.int(-1)), EConst(Term.int(3))))
    check("replace", c1("replace", EConst(Term.str("b")), EConst(Term.str("Z"))))
    check("replace_i", c1("replace", EConst(Term.str("B")), EConst(Term.str("Z")),
      EConst(Term.str("i"))))
    check("regex", c1("regex", EConst(Term.str("^a"))))
    check("regex_i", c1("regex", EConst(Term.str("^A")), EConst(Term.str("i"))))
  }

  test("conditionals match interpreter") {
    check("if", ECall("if", Seq(c2("<"), EVar("a"), EVar("b"))))
    check("coalesce", c2("coalesce"))
    check("in", ECall("in", Seq(EVar("a"), EVar("b"), EConst(Term.int(5)))))
    check("notin", ECall("notin", Seq(EVar("a"), EVar("b"), EConst(Term.int(5)))))
  }

  test("date/time functions match interpreter") {
    Seq("year", "month", "day", "hours", "minutes", "seconds", "tz")
      .foreach(f => check(f, c1(f)))
  }

  test("hash functions match interpreter") {
    Seq("md5", "sha1", "sha256", "sha384", "sha512").foreach(f => check(f, c1(f)))
  }

  test("casts match interpreter") {
    Seq("xsd:integer", "xsd:decimal", "xsd:double", "xsd:float", "xsd:boolean",
      "xsd:string", "xsd:datetime", "xsd:date").foreach(f => check(f, c1(f)))
  }

  test("decimal cast canonical lexical forms agree EXACTLY (trailing zeros)") {
    // the r11 whole-engine differential caught Term.dec keeping "2.50" where
    // the native cast canonicalizes to "2.5" — the value-tolerant `agree`
    // above masks this class, so pin the LEXICAL form here
    val inputs = Seq(
      Lit("2.50", Term.xsdDecimal, null), Lit("13.0", Term.xsdDecimal, null),
      Lit("0.00", Term.xsdDecimal, null), Lit("2.50", Term.xsdString, null),
      Lit("-04.10", Term.xsdString, null), Lit("7", Term.xsdInteger, null))
    val expect = Seq("2.5", "13", "0", "2.5", "-4.1", "7")
    val schema = StructType(Seq(StructField("a", TermRow.schema)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(inputs.map(t => Row(TermRow.toRow(t))), 1), schema)
    val e = ECall("xsd:decimal", Seq(EVar("a")))
    val native = NativeExpr.termColumn(e, Map("a" -> col("a")).get, ctx.nowEpochUs).get
    val got = native.applyTo(df).select(native.result.as("out")).collect()
      .map(r => TV.toTerm(r.getStruct(0)).asInstanceOf[Lit].lexForm).toSeq
    inputs.zip(expect).zip(got).foreach { case ((in, want), g) =>
      val interp = ExprEval.eval(e, { case "a" => in; case _ => null }, ctx)
        .asInstanceOf[Lit].lexForm
      assert(interp == want, s"interp($in) = $interp, want $want")
      assert(g == want, s"native($in) = $g, want $want")
    }
  }

  test("constructors match interpreter") {
    check("strdt", c1("strdt", EConst(Iri(Term.xsdInteger))))
    check("strlang", c1("strlang", EConst(Term.str("EN"))))
  }

  test("hot expression paths compile without ScalaUDF (codegen stays native)") {
    import graft.engine.{Compiler, ExprEval => EE, Results}
    import graft.store.RelToRdf
    val comp = new Compiler(RelToRdf.cached(spark, "/root/testdata/sf0.001"),
      EE.Ctx(nowEpochUs = 1700000000000000L))
    def p(t: String, c: String) = N.iri(s"urn:p:$t:$c")
    // the q_expr_cast shape: cast + strafter + arithmetic + str
    val a = AExtend(AExtend(
      BGP(Seq(
        QuadPattern(V("c"), p("customer", "c_name"), V("nm")),
        QuadPattern(V("c"), p("customer", "c_acctbal"), V("bal")))),
      "keynum", ECall("*", Seq(
        ECall("xsd:integer", Seq(ECall("strafter", Seq(EVar("nm"), EConst(Term.str("#")))))),
        EConst(Term.int(2))))),
      "balstr", ECall("str", Seq(EVar("bal"))))
    val sol = comp.compile(a)
    val plan = sol.df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("batchevalpython"),
      s"UDF leaked into hot expression plan:\n${plan.take(4000)}")
    assert(sol.df.count() > 0)
  }
}
