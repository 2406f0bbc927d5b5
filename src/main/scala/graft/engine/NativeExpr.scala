package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.algebra._
import graft.model.{Term, TermRow}

/** JVM-side duration codec for the codegen path: [[NativeExpr]] calls these via
  * `StaticInvoke` (one compact function call in the generated code) instead of
  * inlining ~8 regex Column ops per operand — the Column-tree replica doubled
  * codegen size of EVERY comparison/equality, measurably slowing queries that
  * never see a duration. Delegating to [[Term.parseDuration]] also makes
  * interpreter/codegen parity true by construction. */
object DurJvm {
  import org.apache.spark.unsafe.types.UTF8String

  /** Canonical xsd:dayTimeDuration lexical form of a micros value. */
  def dayTimeLex(us: Long): UTF8String =
    UTF8String.fromString(Term.dayTimeDurationOfMicros(us).lexForm)
}

/** JVM-side SPARQL value comparison/equality for the codegen path.
  *
  * The inline Column-tree replica of sparqlCompare was the single largest
  * codegen emitter in the engine: an 8-branch type-dispatch `when` chain whose
  * every branch re-generates both operand subtrees (CaseWhen branches are
  * conditionally evaluated, so Catalyst's subexpression elimination cannot
  * share across them) — ONE comparison could exceed Janino's 64 KB method
  * limit, silently dropping the whole stage out of whole-stage codegen. Each
  * comparison now compiles to a single `StaticInvoke` call site, and since
  * these methods delegate to [[ExprEval.valueCompare]]/[[ExprEval.valueEquals]]
  * — the row interpreter the differential suite treats as ground truth —
  * interpreter/codegen parity holds by construction.
  *
  * `kind` arrives pre-coalesced to 0 for a null term struct (a nullable
  * primitive-int argument would read as garbage under `propagateNull = false`;
  * object-typed args pass as plain nulls). */
object CmpJvm {
  import org.apache.spark.unsafe.types.UTF8String
  import graft.model.{BNode, Iri, Lit}

  private def termOf(kind: Int, lex: UTF8String, dt: UTF8String,
      lang: UTF8String): Term =
    if (kind == 0 || lex == null) null
    else kind match {
      case TermRow.KIND_BLANK => BNode(lex.toString)
      case TermRow.KIND_IRI => Iri(lex.toString)
      case _ =>
        val lg = if (lang == null) null else lang.toString
        Lit(lex.toString, if (dt == null) null else dt.toString, lg)
    }

  /** 3-way SPARQL value compare; null = error (incomparable / unbound). */
  def cmp(kA: Int, lexA: UTF8String, dtA: UTF8String, lgA: UTF8String,
      kB: Int, lexB: UTF8String, dtB: UTF8String, lgB: UTF8String): java.lang.Integer = {
    val a = termOf(kA, lexA, dtA, lgA); val b = termOf(kB, lexB, dtB, lgB)
    if (a == null || b == null) return null
    try java.lang.Integer.valueOf(ExprEval.valueCompare(a, b))
    catch { case _: EvalError => null }
  }

  /** SPARQL '=' value equality; null = error (open-world / unbound). */
  def eq(kA: Int, lexA: UTF8String, dtA: UTF8String, lgA: UTF8String,
      kB: Int, lexB: UTF8String, dtB: UTF8String, lgB: UTF8String): java.lang.Boolean = {
    val a = termOf(kA, lexA, dtA, lgA); val b = termOf(kB, lexB, dtB, lgB)
    if (a == null || b == null) return null
    try java.lang.Boolean.valueOf(ExprEval.valueEquals(a, b))
    catch { case _: EvalError => null }
  }
}

/** Native (Catalyst-codegen) compilation of SPARQL scalar expressions.
  *
  * Compiles the hot expression surface — comparison, EBV/logical, arithmetic with
  * numeric-tower promotion, term accessors, string/date/hash functions, casts —
  * to pure `Column` trees over the canonical term-view struct `(kind, lex, dt,
  * lang, num)`. SQL NULL represents the SPARQL row-local error, so Catalyst's
  * 3-valued logic implements the reference's error tables
  * (kasei/kineo `Sources/Kineo/SPARQL/Expression.swift:484-507`) for free and the
  * whole expression stays inside whole-stage codegen — no `ScalaUDF` boxing on
  * the per-row path (the dominant cost of the interpreted fallback at scale).
  *
  * Semantics mirror [[ExprEval]] (itself mirroring Expression.swift:28-876), with
  * documented divergences, all spec-legal:
  *  - xsd:decimal arithmetic runs at Spark `DECIMAL(38,18)` precision instead of
  *    java BigDecimal's MathContext; lexical forms are canonicalized (trailing
  *    zeros stripped).
  *  - integer overflow yields an error (`try_add` → NULL) instead of wrapping.
  *
  * Unsupported shapes (BNODE — needs per-row label scope —, EXISTS, extension
  * functions, encode_for_uri, timezone) return None and fall back to the
  * interpreter UDF in [[Compiler]].
  */
object NativeExpr {
  import Term._
  import TermRow.{KIND_BLANK, KIND_IRI, KIND_LITERAL}

  /** Compiled expression: intermediate columns to add (in order) + the result.
    *
    * Every non-leaf subexpression is bound to a `__ne_*` temp column instead of
    * being inlined: operator implementations reference their operands many times
    * (type-dispatch `when` chains), so textual inlining would grow the tree
    * exponentially with nesting depth — the temps keep the plan a DAG (Spark's
    * CollapseProject leaves multi-referenced non-trivial aliases in their own
    * projection, so codegen evaluates each once per row).
    */
  final case class Compiled(temps: Seq[(String, Column)], result: Column) {
    /** Apply the intermediate columns to a frame.
      *
      * NOT one `withColumn` per temp: every `withColumn` re-analyzes the whole
      * plan, so a fold is quadratic in expression size — measured as the
      * dominant cost on expression-heavy queries (driver-side, single-threaded,
      * so it never parallelizes away). Temps reference earlier temps by name,
      * so they can't all land in one projection either; batching by dependency
      * level gives one analysis pass per expression *depth* instead of per
      * *node* (a flat CONCAT of 20 args is 1 pass, not 21).
      */
    def applyTo(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      if (temps.isEmpty) return df
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val level = scala.collection.mutable.Map.empty[String, Int]
      val batches = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.LinkedHashMap[String, Column]]
      temps.foreach { case (n, c) =>
        val deps = ColumnBridge.expression(c).collect {
          case a: UnresolvedAttribute if level.contains(a.name) => level(a.name)
        }
        val lv = if (deps.isEmpty) 0 else deps.max + 1
        level(n) = lv
        while (batches.size <= lv)
          batches += scala.collection.mutable.LinkedHashMap.empty[String, Column]
        batches(lv)(n) = c
      }
      batches.foldLeft(df)((d, b) => d.withColumns(b.toMap))
    }
  }

  private val tempId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Compile to a term-view struct Column; None = shape not supported natively. */
  def termColumn(e: Expr, view: String => Option[Column], nowUs: Long): Option[Compiled] = {
    val c = new Comp(view, nowUs)
    c.term(e).map(res => Compiled(c.temps.toSeq, res))
  }

  /** Compile to a Boolean EBV Column (null = error → filter drops the row). */
  def ebvColumn(e: Expr, view: String => Option[Column], nowUs: Long): Option[Compiled] = {
    val c = new Comp(view, nowUs)
    c.bool(e).map(res => Compiled(c.temps.toSeq, res))
  }

  /** Inline (temp-free) EBV compile — usable inside JOIN conditions, where no
    * projection can host intermediate columns. Only for SHALLOW expressions:
    * the guard caps the node count, since inlining duplicates operand trees at
    * every reference (see [[Compiled]]). */
  def ebvColumnInline(e: Expr, view: String => Option[Column], nowUs: Long,
      maxNodes: Int = 8): Option[Column] = {
    def size(x: Expr): Int = x match {
      case ECall(_, args) => 1 + args.map(size).sum
      case _ => 1
    }
    if (size(e) > maxNodes) return None
    val c = new Comp(view, nowUs, inline = true)
    c.bool(e)
  }

  // ---- shared column helpers ------------------------------------------------

  private val nullTerm: Column = lit(null).cast(TermRow.schema)
  private val nullS: Column = lit(null).cast(StringType)
  private val nullD: Column = lit(null).cast(DoubleType)
  private val nullB: Column = lit(null).cast(BooleanType)
  private val nullL: Column = lit(null).cast(LongType)
  private val DEC: DecimalType = DecimalType(38, 18)

  private val numericSeq: Seq[String] = numericTypes.toSeq
  private val intFamilySeq: Seq[String] =
    (numericTypes -- Set(xsdDouble, xsdFloat, xsdDecimal)).toSeq

  private def k(t: Column) = t.getField("kind")
  private def lx(t: Column) = t.getField("lex")
  private def dtF(t: Column) = t.getField("dt")
  private def lg(t: Column) = t.getField("lang")
  private def nm(t: Column) = t.getField("num")

  private def mk(kind: Column, lex: Column, dt: Column, lang: Column,
      num: Column): Column =
    struct(kind.cast(IntegerType).as("kind"), lex.cast(StringType).as("lex"),
      dt.cast(StringType).as("dt"), lang.cast(StringType).as("lang"),
      num.cast(DoubleType).as("num"))

  /** Constant term as a literal struct (canonical: same fields as TermRow.toRow). */
  private[engine] def constTerm(t: Term): Column = t match {
    case null => nullTerm
    case graft.model.BNode(l) => mk(lit(KIND_BLANK), lit(l), nullS, nullS, nullD)
    case graft.model.Iri(v) => mk(lit(KIND_IRI), lit(v), nullS, nullS, nullD)
    case litT @ graft.model.Lit(l, dt, lang) =>
      val lgc = if (lang == null || lang.isEmpty) nullS else lit(lang)
      val num = Term.numericValue(litT).map(lit(_)).getOrElse(nullD)
      mk(lit(KIND_LITERAL), lit(l), lit(dt), lgc, num)
  }

  // term-kind / datatype predicates (null-propagating: null struct → null cond)
  private def isLit(t: Column) = k(t) === KIND_LITERAL
  private def numericDt(t: Column) = isLit(t) && dtF(t).isin(numericSeq: _*)
  private def isNum(t: Column) = numericDt(t) && nm(t).isNotNull
  private def isIntFam(t: Column) = dtF(t).isin(intFamilySeq: _*)
  private def isFltDbl(t: Column) = dtF(t) === xsdDouble || dtF(t) === xsdFloat
  private def stringy(t: Column) =
    isLit(t) && (dtF(t) === xsdString || dtF(t) === rdfLangString)
  /** strArg accepts IRIs too (reference Expression.swift string coercion). */
  private def strable(t: Column) = k(t) === KIND_IRI || stringy(t)
  private def simpleStr(t: Column) = isLit(t) && dtF(t) === xsdString && lg(t).isNull
  private def boolLit(t: Column) = isLit(t) && dtF(t) === xsdBoolean
  private def dtIs(t: Column, d: String) = isLit(t) && dtF(t) === d
  private def isDur(t: Column) = isLit(t) && dtF(t).isin(durationTypes.toSeq: _*)

  // duration comparison/equality now ride through [[CmpJvm]] with every other
  // literal family; only the canonical dayTimeDuration FORMATTER still has a
  // dedicated DurJvm entry point (dateTime subtraction constructs durations)

  /** Canonical xsd:dayTimeDuration lexical form of a micros value — one
    * `StaticInvoke` into [[DurJvm]] (→ [[Term.dayTimeDurationOfMicros]]),
    * exact Long component arithmetic by construction. */
  private def dayTimeLex(us: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(StaticInvoke(
      DurJvm.getClass, StringType, "dayTimeLex",
      Seq(ColumnBridge.expression(us)), returnNullable = false))
  }

  private def dayTimeT(us: Column): Column =
    when(us.isNotNull,
      mk(lit(KIND_LITERAL), dayTimeLex(us), lit(xsdDayTimeDuration), nullS, nullD))

  // typed literal constructors
  private def strT(lexC: Column): Column =
    mk(lit(KIND_LITERAL), lexC, lit(xsdString), nullS, nullD)
  private def langT(lexC: Column, langC: Column): Column =
    mk(lit(KIND_LITERAL), lexC, lit(rdfLangString), langC, nullD)
  /** Result keeps the source's language tag (reference likeStringResult). */
  private def langLike(src: Column, lexC: Column): Column =
    when(dtF(src) === rdfLangString, langT(lexC, lg(src)))
      .otherwise(strT(lexC))
  private def boolT(b: Column): Column =
    when(b.isNotNull, mk(lit(KIND_LITERAL), when(b, "true").otherwise("false"),
      lit(xsdBoolean), nullS, nullD))
  private def intT(l: Column): Column =
    when(l.isNotNull, mk(lit(KIND_LITERAL), l.cast(StringType), lit(xsdInteger),
      nullS, l.cast(DoubleType)))
  private def dblT(d: Column): Column =
    when(d.isNotNull, mk(lit(KIND_LITERAL), d.cast(DoubleType).cast(StringType),
      lit(xsdDouble), nullS, d.cast(DoubleType)))
  private def fltT(f: Column): Column =
    when(f.isNotNull, mk(lit(KIND_LITERAL), f.cast(FloatType).cast(StringType),
      lit(xsdFloat), nullS, f.cast(DoubleType)))
  /** Canonical decimal lexical form: strip trailing fraction zeros / bare dot. */
  private def canonDec(c: Column): Column =
    regexp_replace(regexp_replace(c.cast(StringType), "(\\.\\d*?)0+$", "$1"),
      "\\.$", "")
  private def decT(d: Column): Column =
    when(d.isNotNull, mk(lit(KIND_LITERAL), canonDec(d), lit(xsdDecimal),
      nullS, d.cast(DoubleType)))

  // numeric operand access
  private def longOf(t: Column): Column = trim(lx(t)).try_cast(LongType)
  private def decOf(t: Column): Column = trim(lx(t)).try_cast(DEC)
  /** Absolute instant (offsets honored) for dateTime comparison. */
  private def tsOf(t: Column): Column = try_to_timestamp(lx(t))
  /** Wall-clock fields in the value's own timezone: strip the offset, parse as
    * local (reference dtField uses OffsetDateTime's local fields). */
  private def localTs(t: Column): Column =
    try_to_timestamp(regexp_replace(lx(t), "(Z|[+-]\\d{2}:\\d{2})$", ""))

  /** 3-way compare: -1/0/1, null when either side is null (= error). */
  private def cmp3(x: Column, y: Column): Column =
    when(x.isNull || y.isNull, lit(null).cast(IntegerType))
      .when(x < y, -1).when(x > y, 1).otherwise(0)

  private def cmpInvoke(fn: String, rt: DataType, a: Column, b: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(StaticInvoke(
      CmpJvm.getClass, rt, fn,
      Seq(coalesce(k(a), lit(0)), lx(a), dtF(a), lg(a),
        coalesce(k(b), lit(0)), lx(b), dtF(b), lg(b))
        .map(ColumnBridge.expression),
      propagateNull = false, returnNullable = true))
  }

  /** SPARQL value comparison (reference sparqlCompare, Expression.swift:903-957):
    * 3-way result, null = incomparable (error). ONE `StaticInvoke` call site
    * into [[CmpJvm]] → [[ExprEval.valueCompare]] — the inline when-chain
    * replica could exceed Janino's 64 KB method cap on a single comparison
    * (see [[CmpJvm]]). */
  private def cmpCol(a: Column, b: Column): Column =
    cmpInvoke("cmp", IntegerType, a, b)

  /** SPARQL '=' value equality (reference valueEquals): boolean-or-null. */
  private def eqCol(a: Column, b: Column): Column =
    cmpInvoke("eq", BooleanType, a, b)

  /** Effective boolean value of a term column (Term.ebv). */
  private def ebvOf(t: Column): Column =
    when(boolLit(t), lx(t) === "true" || lx(t) === "1")
      .when(numericDt(t),
        when(nm(t).isNotNull, nm(t) =!= 0.0 && !isnan(nm(t))).otherwise(lit(false)))
      .when(isLit(t) && (dtF(t) === xsdString || lg(t).isNotNull), length(lx(t)) > 0)

  // ---- typed-aggregation helpers (used by Compiler.compileGroup) ------------

  /** Numeric-family promotion rank of a term: 0 = integer family, 1 = decimal,
    * 2 = float, 3 = double; null = not a (well-formed) numeric literal. */
  private[engine] def famRank(t: Column): Column =
    when(isNum(t),
      when(isIntFam(t), 0).when(dtF(t) === xsdDecimal, 1)
        .when(dtF(t) === xsdFloat, 2).otherwise(3))

  private[engine] def longVal(t: Column): Column = longOf(t)
  private[engine] def decVal(t: Column): Column = decOf(t)
  private[engine] def decTerm(d: Column): Column = decT(d)
  private[engine] def fltTerm(f: Column): Column = fltT(f)
  private[engine] def intTerm(l: Column): Column = intT(l)

  // ---- the compiler ---------------------------------------------------------

  private final class Comp(view: String => Option[Column], nowUs: Long,
      inline: Boolean = false) {
    val temps = scala.collection.mutable.ListBuffer[(String, Column)]()

    /** Bind a computed column as a temp so downstream operators reference an
      * attribute instead of re-inlining the tree (inline mode: caller
      * guarantees shallowness, e.g. JOIN conditions). */
    private def bindTemp(c: Column): Column =
      if (inline) c
      else {
        val n = s"__ne_${tempId.incrementAndGet()}"
        temps += n -> c
        col(s"`$n`")
      }

    def term(e: Expr): Option[Column] = e match {
      case EConst(t) => Some(constTerm(t)) // constant-folds at reference sites
      case EVar(n) => Some(view(n).getOrElse(nullTerm))
      case EExists(_, _) => None
      case ECall(fn, args) => call(fn, args).map(bindTemp)
    }

    /** Boolean-valued compile: direct for predicates, EBV-wrap otherwise. */
    def bool(e: Expr): Option[Column] = e match {
      case ECall("&&", Seq(a, b)) => for (ca <- bool(a); cb <- bool(b)) yield ca && cb
      case ECall("||", Seq(a, b)) => for (ca <- bool(a); cb <- bool(b)) yield ca || cb
      case ECall("!", Seq(a)) => bool(a).map(c => !c)
      case ECall(op @ ("<" | "<=" | ">" | ">="), Seq(a, b)) =>
        for (ca <- term(a); cb <- term(b)) yield {
          val c = cmpCol(ca, cb)
          op match {
            case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0; case ">=" => c >= 0
          }
        }
      case ECall("=", Seq(a, b)) => for (ca <- term(a); cb <- term(b)) yield eqCol(ca, cb)
      case ECall("!=", Seq(a, b)) => for (ca <- term(a); cb <- term(b)) yield !eqCol(ca, cb)
      case ECall("sameterm", Seq(a, b)) =>
        for (ca <- term(a); cb <- term(b)) yield
          when(ca.isNull || cb.isNull, nullB).otherwise(ca === cb)
      case ECall(fn @ ("in" | "notin"), args) if args.nonEmpty =>
        for (cv <- term(args.head); cs <- traverse(args.tail)) yield {
          // or-chain == SPARQL IN semantics: any true → true (errors ignored),
          // else error if any error, else false (Expression.swift IN handling)
          val anyEq = cs.map(c => eqCol(cv, c)).reduceOption(_ || _).getOrElse(lit(false))
          if (fn == "in") anyEq else !anyEq
        }
      case ECall("bound", Seq(EVar(n))) =>
        Some(view(n).map(v => v.isNotNull).getOrElse(lit(false)))
      case ECall("isiri" | "isuri", Seq(a)) => term(a).map(c => k(c) === KIND_IRI)
      case ECall("isblank", Seq(a)) => term(a).map(c => k(c) === KIND_BLANK)
      case ECall("isliteral", Seq(a)) => term(a).map(c => k(c) === KIND_LITERAL)
      case ECall("isnumeric", Seq(a)) =>
        term(a).map(c => when(c.isNull, nullB).otherwise(numericDt(c)))
      case ECall("regex", args) => regexCol(args)
      case ECall("contains", Seq(a, b)) => strPairBool(a, b)((x, y) => x.contains(y))
      case ECall("strstarts", Seq(a, b)) => strPairBool(a, b)(startswith)
      case ECall("strends", Seq(a, b)) => strPairBool(a, b)(endswith)
      case ECall("langmatches", Seq(a, b)) =>
        for (ca <- term(a); cb <- term(b)) yield
          when(strable(ca) && strable(cb),
            when(lower(lx(cb)) === "*", length(lx(ca)) > 0)
              .otherwise(lower(lx(ca)) === lower(lx(cb)) ||
                startswith(lower(lx(ca)), concat(lower(lx(cb)), lit("-")))))
      case _ => term(e).map(ebvOf)
    }

    private def traverse(es: Seq[Expr]): Option[Seq[Column]] = {
      val cs = es.map(term)
      if (cs.forall(_.isDefined)) Some(cs.map(_.get)) else None
    }

    // scalastyle:off cyclomatic.complexity method.length
    private def call(fn: String, args: Seq[Expr]): Option[Column] = fn match {
      // boolean-valued functions → EBV struct
      case "&&" | "||" | "!" | "<" | "<=" | ">" | ">=" | "=" | "!=" | "sameterm" |
           "in" | "notin" | "bound" | "isiri" | "isuri" | "isblank" | "isliteral" |
           "isnumeric" | "regex" | "contains" | "strstarts" | "strends" |
           "langmatches" =>
        bool(ECall(fn, args)).map(boolT)

      // arithmetic (numeric-tower promotion, Expression.swift:532-564)
      case "+" | "-" | "*" =>
        for (a <- term(args(0)); b <- term(args(1))) yield arith(fn, a, b)
      case "/" =>
        for (a <- term(args(0)); b <- term(args(1))) yield divide(a, b)
      case "neg" =>
        term(args(0)).map(a => arith("-", constTerm(Term.int(0L)), a))

      // conditionals
      case "if" =>
        for (c <- bool(args(0)); t <- term(args(1)); e <- term(args(2))) yield
          when(c.isNull, nullTerm).when(c, t).otherwise(e)
      case "coalesce" => traverse(args).map(cs => coalesce(cs: _*))

      // accessors / constructors
      case "str" =>
        term(args(0)).map(t =>
          when(k(t) === KIND_IRI || k(t) === KIND_LITERAL, strT(lx(t))))
      case "lang" =>
        term(args(0)).map(t => when(isLit(t), strT(coalesce(lg(t), lit("")))))
      case "datatype" =>
        term(args(0)).map(t => when(isLit(t),
          mk(lit(KIND_IRI),
            when(lg(t).isNotNull && lg(t) =!= "", lit(rdfLangString)).otherwise(dtF(t)),
            nullS, nullS, nullD)))
      case "iri" | "uri" =>
        term(args(0)).map(t =>
          when(k(t) === KIND_IRI, t)
            .when(simpleStr(t), mk(lit(KIND_IRI), lx(t), nullS, nullS, nullD)))
      case "strdt" =>
        for (a <- term(args(0)); b <- term(args(1))) yield
          when(simpleStr(a) && strable(b),
            mk(lit(KIND_LITERAL), lx(a), lx(b), nullS,
              when(lx(b).isin(numericSeq: _*), lx(a).try_cast(DoubleType))
                .otherwise(nullD)))
      case "strlang" =>
        for (a <- term(args(0)); b <- term(args(1))) yield
          when(simpleStr(a) && strable(b), langT(lx(a), lower(lx(b))))
      case "uuid" =>
        Some(mk(lit(KIND_IRI), concat(lit("urn:uuid:"), uuid()), nullS, nullS, nullD))
      case "struuid" => Some(strT(uuid()))

      // strings (Expression.swift:318-430)
      case "strlen" =>
        term(args(0)).map(t => when(strable(t), intT(length(lx(t)).cast(LongType))))
      case "ucase" =>
        term(args(0)).map(t => when(strable(t), langLike(t, upper(lx(t)))))
      case "lcase" =>
        term(args(0)).map(t => when(strable(t), langLike(t, lower(lx(t)))))
      case "concat" =>
        traverse(args).map { cs =>
          val allOk = cs.map(stringy).reduceOption(_ && _).getOrElse(lit(true))
          val lexAll = concat(cs.map(lx): _*)
          val first = lg(cs.head)
          val allSameLang = cs.tail.map(c => lg(c) <=> first)
            .reduceOption(_ && _).getOrElse(lit(true))
          when(allOk,
            when(allSameLang && first.isNotNull, langT(lexAll, first))
              .otherwise(strT(lexAll)))
        }
      case "strbefore" =>
        strPair(args(0), args(1)) { (src, a, b) =>
          val i = instr(a, b)
          when(length(b) === 0, langLike(src, lit("")))
            .when(i >= 1, langLike(src, a.substr(lit(1), i - 1)))
            .otherwise(strT(lit("")))
        }
      case "strafter" =>
        strPair(args(0), args(1)) { (src, a, b) =>
          val i = instr(a, b)
          when(length(b) === 0, langLike(src, a))
            .when(i >= 1, langLike(src, a.substr(i + length(b), length(a))))
            .otherwise(strT(lit("")))
        }
      case "substr" =>
        for {
          src <- term(args(0))
          st <- term(args(1))
          lenOpt <- if (args.size > 2) term(args(2)).map(Some(_)) else Some(None)
        } yield {
          val start = intArg(st)
          val from0 = greatest(start - 1, lit(0L))
          val cpLen = length(lx(src)).cast(LongType)
          val end0 = lenOpt match {
            case Some(l) => least(greatest(start - 1 + intArg(l), from0), cpLen)
            case None => cpLen
          }
          val out = lx(src).substr((from0 + 1).cast(IntegerType),
            (end0 - from0).cast(IntegerType))
          when(strable(src) && start.isNotNull &&
            lenOpt.map(l => intArg(l).isNotNull).getOrElse(lit(true)),
            langLike(src, out))
        }
      case "replace" if args.size <= 3 || constFlags(args.lift(3)).isDefined =>
        val prefix = if (args.size > 3) constFlags(args.lift(3)).get else ""
        for (src <- term(args(0)); p <- term(args(1)); r <- term(args(2))) yield
          when(strable(src) && strable(p) && strable(r),
            langLike(src, regexp_replace(lx(src),
              concat(lit(prefix), lx(p)), lx(r))))

      // numeric unary (Expression.swift:432-455)
      case "abs" => term(args(0)).map(numUnary(_,
        l => abs(l), d => abs(d), f => abs(f).cast(FloatType), dc => abs(dc)))
      case "round" => term(args(0)).map(numUnary(_,
        l => l, d => floor(d + 0.5).cast(DoubleType), // round-half-up toward +inf
        f => floor(f + 0.5).cast(FloatType),
        // XPath ties toward +inf for decimals too: floor(x + 0.5), not
        // Spark's round() (HALF_UP sends -1.5 to -2)
        dc => floor(dc + lit(0.5)).cast(DEC)))
      case "ceil" => term(args(0)).map(numUnary(_,
        l => l, d => ceil(d).cast(DoubleType), f => ceil(f).cast(FloatType),
        dc => ceil(dc).cast(DEC)))
      case "floor" => term(args(0)).map(numUnary(_,
        l => l, d => floor(d).cast(DoubleType), f => floor(f).cast(FloatType),
        dc => floor(dc).cast(DEC)))
      case "rand" => Some(dblT(rand()))

      // date/time (Expression.swift:115-176): local fields of the value's zone
      case "now" => Some(constTerm(Term.dateTimeMicros(nowUs)))
      case "year" => dtAccessor(args)(t => year(localTs(t)))
      case "month" => dtAccessor(args)(t => month(localTs(t)))
      case "day" => dtAccessor(args)(t => dayofmonth(localTs(t)))
      case "hours" => dtAccessor(args)(t => hour(localTs(t)))
      case "minutes" => dtAccessor(args)(t => minute(localTs(t)))
      case "seconds" =>
        term(args(0)).map(t =>
          when(dtIs(t, xsdDateTime) || dtIs(t, xsdDate),
            decT(date_part(lit("SECOND"), localTs(t)))))
      case "tz" =>
        term(args(0)).map(t => when(dtIs(t, xsdDateTime),
          when(endswith(lx(t), lit("Z")), strT(lit("Z")))
            .when(lx(t).rlike("[+-]\\d{2}:\\d{2}$"),
              strT(regexp_extract(lx(t), "([+-]\\d{2}:\\d{2})$", 1)))
            .otherwise(strT(lit("")))))

      // hashes (simple literals only)
      case "md5" => hashFn(args)(b => md5(b))
      case "sha1" => hashFn(args)(b => sha1(b))
      case "sha256" => hashFn(args)(b => sha2(b, 256))
      case "sha384" => hashFn(args)(b => sha2(b, 384))
      case "sha512" => hashFn(args)(b => sha2(b, 512))

      // casts (Expression.swift:602-748)
      case "xsd:integer" => term(args(0)).map(castInteger)
      case "xsd:decimal" => term(args(0)).map(castDecimal)
      case "xsd:double" => term(args(0)).map(castFloatDouble(_, double = true))
      case "xsd:float" => term(args(0)).map(castFloatDouble(_, double = false))
      case "xsd:boolean" => term(args(0)).map(castBoolean)
      case "xsd:string" =>
        term(args(0)).map(t =>
          when(k(t) === KIND_IRI || k(t) === KIND_LITERAL, strT(lx(t))))
      case "xsd:datetime" =>
        term(args(0)).map { t =>
          when(dtIs(t, xsdDateTime), t)
            .when(dtIs(t, xsdString) && try_to_timestamp(lx(t)).isNotNull &&
              lx(t).rlike("^\\d{4}-\\d{2}-\\d{2}T"),
              mk(lit(KIND_LITERAL), lx(t), lit(xsdDateTime), nullS, nullD))
            .when(dtIs(t, xsdDate),
              mk(lit(KIND_LITERAL), concat(lx(t), lit("T00:00:00Z")),
                lit(xsdDateTime), nullS, nullD))
        }
      case "xsd:date" =>
        term(args(0)).map { t =>
          when(dtIs(t, xsdDate), t)
            .when(dtIs(t, xsdString) && lx(t).rlike("^\\d{4}-\\d{2}-\\d{2}$") &&
              try_to_date(lx(t)).isNotNull,
              mk(lit(KIND_LITERAL), lx(t), lit(xsdDate), nullS, nullD))
            .when(dtIs(t, xsdDateTime),
              mk(lit(KIND_LITERAL), lx(t).substr(1, 10), lit(xsdDate), nullS, nullD))
        }

      case _ => None // bnode / encode_for_uri / timezone / extensions → UDF fallback
    }
    // scalastyle:on

    /** Integer argument value (reference: NInt → toInt; else round-half-up). */
    private def intArg(t: Column): Column =
      when(isNum(t),
        when(isIntFam(t), longOf(t)).otherwise(floor(nm(t) + 0.5).cast(LongType)))

    private def arith(op: String, a: Column, b: Column): Column = {
      val anyD = dtF(a) === xsdDouble || dtF(b) === xsdDouble
      val anyF = dtF(a) === xsdFloat || dtF(b) === xsdFloat
      val bothI = isIntFam(a) && isIntFam(b)
      def dop(x: Column, y: Column): Column = op match {
        case "+" => x + y; case "-" => x - y; case "*" => x * y
      }
      def top(x: Column, y: Column): Column = op match {
        case "+" => try_add(x, y); case "-" => try_subtract(x, y)
        case "*" => try_multiply(x, y)
      }
      val numeric = when(isNum(a) && isNum(b),
        when(bothI, intT(top(longOf(a), longOf(b))))
          .when(anyD, dblT(dop(nm(a), nm(b))))
          .when(anyF, fltT(dop(nm(a), nm(b)).cast(FloatType)))
          .otherwise(decT(top(decOf(a), decOf(b)).cast(DEC))))
      // XPath op:subtract-dateTimes: dateTime − dateTime → dayTimeDuration
      if (op == "-")
        numeric.when(dtIs(a, xsdDateTime) && dtIs(b, xsdDateTime),
          dayTimeT(unix_micros(tsOf(a)) - unix_micros(tsOf(b))))
      else numeric
    }

    /** IEEE double division: x/0 → ±Inf, 0/0 → NaN (ANSI Divide would throw). */
    private def ieeeDiv(x: Column, y: Column): Column =
      when(x.isNull || y.isNull, nullD)
        .when(y =!= 0.0, x / y)
        .when(x > 0.0, lit(Double.PositiveInfinity))
        .when(x < 0.0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN))

    private def divide(a: Column, b: Column): Column = {
      val anyD = dtF(a) === xsdDouble || dtF(b) === xsdDouble
      val anyF = dtF(a) === xsdFloat || dtF(b) === xsdFloat
      when(isNum(a) && isNum(b),
        // an int/decimal ZERO divisor is an error regardless of promotion
        // (reference checks the divisor before promoting); only float/double
        // zero divisors produce IEEE ±Inf/NaN
        when(!isFltDbl(b) && nm(b) === 0.0, nullTerm)
          .when(anyD, dblT(ieeeDiv(nm(a), nm(b)))) // double div-by-zero → ±Inf
          .when(anyF, fltT(ieeeDiv(nm(a), nm(b)).cast(FloatType)))
          // int/int and decimal mixes → exact decimal; /0 → null (error).
          // Operands cast to DECIMAL(20,10): under Spark's division typing this
          // keeps 18 fractional result digits (DECIMAL(38,18) operands would
          // collapse the quotient to scale 6); values beyond 10 integer digits
          // error out of the native path — spec-legal precision bound
          .otherwise(decT(try_divide(
            trim(lx(a)).try_cast(DecimalType(20, 10)),
            trim(lx(b)).try_cast(DecimalType(20, 10))).cast(DEC))))
    }

    /** Family-dispatched numeric unary with type preservation. */
    private def numUnary(t: Column, fi: Column => Column, fd: Column => Column,
        ff: Column => Column, fdec: Column => Column): Column =
      when(isNum(t),
        when(isIntFam(t), intT(fi(longOf(t))))
          .when(dtF(t) === xsdDouble, dblT(fd(nm(t))))
          .when(dtF(t) === xsdFloat, fltT(ff(nm(t).cast(FloatType))))
          .otherwise(decT(fdec(decOf(t)))))

    /** String-pair compatibility (reference strPair: 2nd arg simple or same lang). */
    private def strPairBool(ea: Expr, eb: Expr)(f: (Column, Column) => Column)
        : Option[Column] =
      for (a <- term(ea); b <- term(eb)) yield
        when(stringy(a) && stringy(b) && (lg(b).isNull || (lg(a) <=> lg(b))),
          f(lx(a), lx(b)))

    private def strPair(ea: Expr, eb: Expr)(
        f: (Column, Column, Column) => Column): Option[Column] =
      for (a <- term(ea); b <- term(eb)) yield
        when(stringy(a) && stringy(b) && (lg(b).isNull || (lg(a) <=> lg(b))),
          f(a, lx(a), lx(b)))

    /** REGEX with optional *constant* flags (embedded-flag prefix). */
    private def regexCol(args: Seq[Expr]): Option[Column] = {
      val prefixOpt =
        if (args.size <= 2) Some("") else constFlags(args.lift(2))
      for {
        prefix <- prefixOpt
        s <- term(args(0))
        p <- term(args(1))
      } yield when(strable(s) && strable(p),
        rlike(lx(s), concat(lit(prefix), lx(p))))
    }

    /** Map a constant flags argument to a Java embedded-flags prefix; None for
      * non-constant flags or the LITERAL flag (no embedded equivalent). */
    private def constFlags(e: Option[Expr]): Option[String] = e match {
      case Some(EConst(graft.model.Lit(f, dt, lang)))
          if dt == xsdString && (lang == null || lang.isEmpty) =>
        if (f.isEmpty) Some("")
        else if (f.contains('q') || f.exists(c => !"ismx".contains(c))) None
        else Some("(?" + f.flatMap {
          case 'i' => "iu"
          case c => c.toString
        } + ")")
      case _ => None
    }

    private def dtAccessor(args: Seq[Expr])(f: Column => Column): Option[Column] =
      term(args(0)).map(t =>
        when(dtIs(t, xsdDateTime) || dtIs(t, xsdDate), intT(f(t).cast(LongType))))

    private def hashFn(args: Seq[Expr])(f: Column => Column): Option[Column] =
      term(args(0)).map(t =>
        when(simpleStr(t), strT(f(lx(t).cast(BinaryType)))))

    private def castInteger(t: Column): Column =
      when(isLit(t),
        when(dtF(t) === xsdBoolean,
          intT(when(lx(t) === "true" || lx(t) === "1", 1L).otherwise(0L)))
          .when(numericDt(t) && isIntFam(t), intT(longOf(t)))
          .when(isNum(t), intT(nm(t).try_cast(LongType))) // truncate toward zero
          .when(dtF(t) === xsdString, {
            val asLong = trim(lx(t)).try_cast(LongType)
            val asDec = trim(lx(t)).try_cast(DEC)
            when(asLong.isNotNull, intT(asLong))
              // toLongExact: integral decimals only ("4.0" → 4, "4.5" → error)
              .when(asDec.isNotNull && asDec === floor(asDec).cast(DEC),
                intT(asDec.try_cast(LongType)))
          }))

    private def castDecimal(t: Column): Column =
      when(isLit(t),
        when(dtF(t) === xsdBoolean,
          decT(when(lx(t) === "true" || lx(t) === "1", 1).otherwise(0).cast(DEC)))
          .when(numericDt(t) || dtF(t) === xsdString,
            decT(trim(lx(t)).try_cast(DEC))))

    private def castFloatDouble(t: Column, double: Boolean): Column = {
      val v = trim(lx(t)).try_cast(DoubleType)
      when(isLit(t),
        when(dtF(t) === xsdBoolean, {
          val b = lx(t) === "true" || lx(t) === "1"
          if (double) dblT(when(b, 1.0).otherwise(0.0))
          else fltT(when(b, 1.0f).otherwise(0.0f))
        })
          .when(numericDt(t) || dtF(t) === xsdString,
            if (double) dblT(v) else fltT(v.cast(FloatType))))
    }

    private def castBoolean(t: Column): Column =
      when(isLit(t),
        when(dtF(t) === xsdBoolean, t)
          .when(dtF(t) === xsdString && lx(t).isin("true", "false", "1", "0"),
            boolT(lx(t) === "true" || lx(t) === "1"))
          .when(isNum(t), boolT(nm(t) =!= 0.0))) // NaN ≠ 0 → true (matches numOf.d)
  }
}
