package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.algebra._
import graft.model._
import graft.store._
import graft.engine._
import graft.testkit.{Isomorphism, RefInterp}

/** Property-based whole-engine differential: random small algebra trees over
  * random tiny datasets, Spark engine vs [[RefInterp]] — the reference's
  * two-evaluator cross-check (SPARQLTestSuite.swift:19-20) generalized from a
  * fixed corpus to generated shapes. Fixed seed → deterministic CI; every
  * failure message carries the (dataset, algebra) pair for replay.
  *
  * Generation is restricted to shapes where the two evaluation strategies
  * are REQUIRED to agree: no RAND/NOW/BNODE, no unordered LIMIT, no REDUCED
  * (cardinality latitude). Everything else — joins over possibly-unbound
  * vars, OPTIONAL with filters, MINUS domain corners, nested and correlated
  * (NOT) EXISTS, property paths incl. closures and NPS, grouped aggregates,
  * arithmetic/comparison errors-as-unbound — is fair game.
  */
class FuzzDiffSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark
  private val ctx = ExprEval.Ctx(nowEpochUs = 1700000000000000L)

  // knobs for exploratory runs: SPARK_GRAFT_FUZZ_SEED / _DATASETS / _QUERIES
  private val baseSeed =
    sys.env.get("SPARK_GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L)
  private val NDatasets =
    sys.env.get("SPARK_GRAFT_FUZZ_DATASETS").map(_.toInt).getOrElse(10)
  private val QueriesPer =
    sys.env.get("SPARK_GRAFT_FUZZ_QUERIES").map(_.toInt).getOrElse(12)
  /** Base tree depth (actual depth = base + rnd(0..1)); deeper trees probe
    * nested-scope corners at the cost of wider plans per case. */
  private val Depth =
    sys.env.get("SPARK_GRAFT_FUZZ_DEPTH").map(_.toInt).getOrElse(2)

  private val iris = (0 until 6).map(i => Iri(s"http://f.ex/i$i"))
  private val preds = (0 until 4).map(i => s"http://f.ex/p$i")
  private val lits: IndexedSeq[Term] =
    IndexedSeq(Term.str("a"), Term.str("b"), Term.int(1), Term.int(2), Term.int(3),
      // float specials: NaN (all comparisons false, != true, errors nowhere),
      // the infinities, negative zero (= 0.0 but a distinct term), and a
      // decimal — the numeric-promotion and total-order corners
      Lit("NaN", Term.xsdDouble, null), Lit("INF", Term.xsdDouble, null),
      Lit("-INF", Term.xsdDouble, null), Lit("-0.0", Term.xsdDouble, null),
      Lit("2.5", Term.xsdDecimal, null))
  private val g: Term = Iri("http://f.ex/g")
  // named graphs beyond the default: GRAPH <iri> / GRAPH ?g dispatch corners
  // (graph-var binding, named-set restriction, cross-graph duplicates) get
  // random coverage, not just the fixed W3C graph manifests
  private val namedGs = IndexedSeq(Iri("http://f.ex/g1"), Iri("http://f.ex/g2"))

  private final class Gen(seed: Long) {
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: IndexedSeq[A]): A = xs(rnd.nextInt(xs.length))
    def chance(p: Double): Boolean = rnd.nextDouble() < p

    def quads(): Seq[(Term, Term, Term, Term)] = {
      val qs = Seq.fill(15 + rnd.nextInt(26)) { // dense: joins/paths usually match
        (pick(iris), Iri(pick(preds.toIndexedSeq)),
          if (chance(0.6)) pick(iris) else pick(lits),
          if (chance(0.7)) g else pick(namedGs))
      }
      // the default graph must be non-empty (buildStore keys its id on it)
      if (qs.exists(_._4 == g)) qs
      else qs.updated(0, qs.head.copy(_4 = g))
    }

    /** Graph context for a pattern block: mostly default, else a named-graph
      * constant or a graph VARIABLE (possibly shared with the row scope —
      * the correlated-dispatch corner). */
    def graphNode(scope: Seq[String]): Node =
      if (chance(0.75)) DefaultGraph
      else if (chance(0.5)) T(pick(namedGs))
      else V(someVar(scope))

    private var vn = 0
    def freshVar(): String = { vn += 1; s"v$vn" }
    def someVar(scope: Seq[String]): String =
      if (scope.nonEmpty && chance(0.8)) pick(scope.toIndexedSeq) else freshVar()

    def node(scope: Seq[String], allowLit: Boolean): Node =
      if (chance(0.7)) V(someVar(scope))
      else if (allowLit && chance(0.4)) T(pick(lits))
      else T(pick(iris))

    def bgp(scope: Seq[String]): BGP = {
      var sc = scope
      val gn = graphNode(scope)
      sc = (sc ++ Seq(gn).collect { case V(n) => n }).distinct
      BGP(Seq.fill(1 + rnd.nextInt(3)) {
        val s = node(sc, allowLit = false)
        val p: Node = if (chance(0.15)) V(someVar(sc)) else N.iri(pick(preds.toIndexedSeq))
        val o = node(sc, allowLit = true)
        sc = (sc ++ Seq(s, p, o).collect { case V(n) => n }).distinct
        QuadPattern(s, p, o, gn)
      })
    }

    def path(): PathE = {
      def leaf(): PathE =
        if (chance(0.85)) PLink(pick(preds.toIndexedSeq))
        else PNeg(Seq(pick(preds.toIndexedSeq)),
          if (chance(0.5)) Seq(pick(preds.toIndexedSeq)) else Nil)
      def p(depth: Int): PathE =
        if (depth == 0) leaf()
        else rnd.nextInt(6) match {
          case 0 => PSeq(p(depth - 1), p(depth - 1))
          case 1 => PAlt(p(depth - 1), p(depth - 1))
          case 2 => PInv(p(depth - 1))
          case 3 => PPlus(leaf())
          case 4 => PStar(leaf())
          case 5 => PZeroOne(p(depth - 1))
        }
      p(1 + rnd.nextInt(2))
    }

    def expr(scope: Seq[String], depth: Int): Expr =
      if (depth == 0 || scope.isEmpty)
        if (scope.nonEmpty && chance(0.5)) EVar(pick(scope.toIndexedSeq))
        else EConst(pick(lits))
      else rnd.nextInt(8) match {
        case 0 | 1 => // bias to comparisons that usually hold on this vocab
          ECall(pick(IndexedSeq("!=", "!=", "<=", ">=", "=", "<")),
            Seq(expr(scope, 0), expr(scope, 0)))
        case 2 => ECall(pick(IndexedSeq("||", "||", "&&")),
          Seq(expr(scope, depth - 1), expr(scope, depth - 1)))
        case 3 =>
          if (chance(0.6)) ECall("!", Seq(expr(scope, depth - 1)))
          // error-propagation corners: IF's condition is an EBV (error →
          // whole IF errors), COALESCE skips errors, STR/STRLEN on iris/ints
          else rnd.nextInt(3) match {
            case 0 => ECall("if", Seq(expr(scope, depth - 1),
              expr(scope, 0), expr(scope, 0)))
            case 1 => ECall("coalesce", Seq(expr(scope, 0), expr(scope, 0)))
            case 2 => ECall("strlen", Seq(ECall("str", Seq(expr(scope, 0)))))
          }
        case 4 | 7 => ECall("bound", Seq(EVar(pick(scope.toIndexedSeq))))
        case 5 => ECall(pick(IndexedSeq("+", "-", "*")),
          Seq(expr(scope, 0), expr(scope, 0)))
        case 6 => EExists(existsPattern(scope, depth - 1), negated = chance(0.5))
      }

    /** EXISTS body: usually a flat BGP, sometimes a join-shaped tree whose
      * RIGHT operand hides outer-scope refs in a nested filter or nested
      * (NOT) EXISTS — the §18.6 substitution-into-join-right path (r12) —
      * or a MINUS right operand, whose nested refs stay UNcorrelated on
      * both sides (the pinned semantic; the differential checks the pin). */
    def existsPattern(scope: Seq[String], depth: Int): Algebra =
      if (depth <= 0 || chance(0.5)) bgp(scope)
      else {
        val right0 = bgp(Nil)
        val rscope = (scope ++ Algebra.inscope(right0).toSeq.sorted).distinct
        rnd.nextInt(4) match {
          case 0 => AJoin(bgp(scope), AFilter(expr(rscope, 1), right0))
          case 1 => AJoin(bgp(if (chance(0.5)) scope else Nil),
            AFilter(EExists(bgp(rscope), negated = chance(0.5)), right0))
          case 2 => ALeftJoin(bgp(scope), AFilter(expr(rscope, 1), right0), None)
          case 3 => AMinus(bgp(scope), AFilter(expr(rscope, 1), right0))
        }
      }

    def table(scope: Seq[String]): ATable = {
      // inline VALUES with UNDEF holes: the prime source of possibly-unbound
      // vars for compat-join/MINUS/EXISTS corners
      val vars = Seq.fill(1 + rnd.nextInt(2))(someVar(scope)).distinct
      val rows = Seq.fill(1 + rnd.nextInt(3))(vars.map(_ =>
        if (chance(0.25)) None
        else Some(if (chance(0.6)) pick(iris): Term else pick(lits))))
      ATable(vars, rows)
    }

    def alg(depth: Int): Algebra = {
      if (depth == 0)
        return if (chance(0.75)) bgp(Nil)
        else if (chance(0.5)) table(Nil)
        else APath(node(Nil, allowLit = false), path(),
          node(Nil, allowLit = true), graphNode(Nil))
      rnd.nextInt(13) match {
        case 0 => AJoin(alg(depth - 1), alg(depth - 1))
        case 1 => AUnion(alg(depth - 1), alg(depth - 1))
        case 2 =>
          val l = alg(depth - 1)
          val e = if (chance(0.5))
            Some(expr(Algebra.inscope(l).toSeq.sorted, 2)) else None
          ALeftJoin(l, alg(depth - 1), e)
        case 3 => AMinus(alg(depth - 1), alg(depth - 1))
        case 4 =>
          val c = alg(depth - 1)
          AFilter(expr(Algebra.inscope(c).toSeq.sorted, 2), c)
        case 5 => ADistinct(alg(depth - 1))
        case 6 =>
          val c = alg(depth - 1)
          AExtend(c, freshVar(), expr(Algebra.inscope(c).toSeq.sorted, 1))
        case 7 =>
          val c = alg(depth - 1)
          val in = Algebra.inscope(c).toSeq.sorted
          if (in.isEmpty) c
          else {
            val keys = rnd.shuffle(in).take(1 + rnd.nextInt(2.min(in.length)))
            val nAggs = rnd.nextInt(3)
            val aggs = Seq.fill(nAggs) {
              val fn = pick(IndexedSeq("count", "sum", "avg", "min", "max",
                "sample", "group_concat"))
              AggSpec(freshVar(), fn,
                if (fn == "count" && chance(0.4)) None
                // correlated (NOT) EXISTS as the aggregate argument — the
                // per-row flag path (boolean inputs: COUNT counts them,
                // SUM errors to unbound; both engines must agree either way)
                else if (chance(0.15))
                  Some(EExists(bgp(in), negated = chance(0.5)))
                else Some(EVar(pick(in.toIndexedSeq))),
                distinct = chance(0.3))
            }
            AGroup(c, keys, aggs)
          }
        case 8 =>
          val c = alg(depth - 1)
          val in = Algebra.inscope(c).toSeq.sorted
          if (in.isEmpty) c
          else AProject(c, rnd.shuffle(in).take(1 + rnd.nextInt(in.length)))
        case 9 => alg(depth - 1)
        case 10 =>
          // ordered slice: DISTINCT + ORDER BY every in-scope var is a TOTAL
          // order (distinct solutions must differ in some key, and the
          // SPARQL term order including the unbound-first rule is total), so
          // the sliced result SET is deterministic and both engines must
          // select identical solutions — this exercises the order comparator
          // and OFFSET/LIMIT against the interpreter, which the fixed corpus
          // only covers with hand-picked keys
          val c = ADistinct(alg(depth - 1))
          val in = Algebra.inscope(c).toSeq.sorted
          if (in.isEmpty) c
          else {
            val keys = in.map(v => SortKey(EVar(v), asc = chance(0.7)))
            ASlice(AOrderBy(c, keys), rnd.nextInt(3).toLong,
              (1 + rnd.nextInt(5)).toLong)
          }
        case 11 =>
          // window pass: order by EVERY in-scope var (ties ⇒ identical
          // bindings, so frame contents, rank ties, first-non-null SAMPLE
          // and float summation order are all deterministic as multisets) —
          // NTILE peer-groups, ROWS frame bounds (incl. empty and clamped
          // frames), and the typed frame aggregates are exactly the
          // semantics only a differential catches
          val c = alg(depth - 1)
          val in = Algebra.inscope(c).toSeq.sorted
          if (in.isEmpty) c
          else {
            val ordKeys = in.map(v => SortKey(EVar(v), asc = chance(0.7)))
            val partBy = if (chance(0.4)) Seq(pick(in.toIndexedSeq)) else Nil
            val rankFns = IndexedSeq("rank", "dense_rank", "row_number", "ntile")
            val aggFns = IndexedSeq("count", "sum", "avg", "min", "max",
              "sample", "group_concat")
            val fn = if (chance(0.45)) pick(rankFns) else pick(aggFns)
            val frame: Option[(Long, Long)] =
              if (rankFns.contains(fn) || chance(0.35)) None
              else Some((pick(IndexedSeq(Long.MinValue, -2L, -1L, 0L)),
                pick(IndexedSeq(Long.MaxValue, 2L, 1L, 0L))))
            val e =
              if (rankFns.contains(fn)) None
              else if (fn == "count" && chance(0.3)) None
              else Some(EVar(pick(in.toIndexedSeq)))
            AWindow(c, Seq(WinSpec(freshVar(), fn, e, partBy, ordKeys, frame,
              arg = 1 + rnd.nextInt(4))))
          }
        case 12 =>
          // federated leg: a sibling BGP binds the endpoint var in SUBJECT
          // position (subjects are always IRIs in this vocabulary, so both
          // SILENT and strict dispatch are exercised without data-dependent
          // failures); the harness self-federates every data IRI to the
          // dataset itself, so engine and interpreter see identical remote
          // bindings and must agree on the joined result
          val sv = freshVar()
          val left = BGP(Seq(QuadPattern(V(sv),
            N.iri(pick(preds.toIndexedSeq)), node(Nil, allowLit = true))))
          val child = bgp(if (chance(0.3)) Seq(sv) else Nil)
          AJoin(left, AService(V(sv), child, silent = chance(0.5)))
      }
    }
  }

  private def buildStore(quads: Seq[(Term, Term, Term, Term)]): RdfStore = {
    val schema = StructType(Seq("s", "p", "o", "g").map(n =>
      StructField(n, TermRow.schema, nullable = true)))
    val rows = quads.map { case (s, p, o, gg) =>
      Row(TermRow.toRow(s), TermRow.toRow(p), TermRow.toRow(o), TermRow.toRow(gg)) }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val st = StoreEncoder.encode(df, IriScheme.default)
    // W3C dataset shape: ONE default graph (g), g1/g2 reachable via GRAPH
    // only — encode() defaults to all-graphs-default, which would hide the
    // dispatch semantics the multi-graph grammar exists to test
    st.copy(defaultGraphs = Seq(st.idOf(g).get))
  }

  private def engineRows(comp: Compiler, alg: Algebra): Seq[Map[String, Term]] = {
    val m = Results.materialize(comp, comp.compile(alg))
    val cols = m.columns
    m.collect().toSeq.map { r =>
      cols.zipWithIndex.flatMap { case (c, i) =>
        if (r.isNullAt(i)) None
        else Option(TermRow.fromRow(r.getStruct(i))).map(c -> _)
      }.toMap
    }
  }

  test("engine and reference interpreter agree on random algebra/dataset pairs", Slow) {
    var checked = 0
    var nonEmpty = 0
    val failures = scala.collection.mutable.ListBuffer[String]()
    for (d <- 0 until NDatasets) {
      val gen = new Gen(baseSeed + d * 7919L)
      val triples = gen.quads()
      val store = buildStore(triples)
      // self-federation registry: every data IRI resolves to the dataset
      // itself, so SERVICE ?ep dispatch is exercised against known bindings
      val svc: Option[ServiceClient] = Some(new LocalServiceClient(
        iris.map(i => i.value -> store).toMap))
      val comp = new Compiler(store, ctx, svc)
      // the reference's two-STORE device on top of the two-evaluator one:
      // the same random dataset through the persisted bucketed layout
      // (inline-id codec, subject bucketing) — every 3rd query re-runs
      // against it, so codec/layout bugs surface under random shapes too
      val pdir = s"/tmp/graft_fuzz_store/$baseSeed-$d"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pdir))
      StorePersist.save(store, pdir, buckets = 4)
      val pcomp = new Compiler(StorePersist.open(spark, pdir), ctx, svc)
      val ds = RefInterp.Dataset.fromQuads(triples, Set(g))
      for (q <- 0 until QueriesPer) {
        val a0 = gen.alg(Depth + gen.rnd.nextInt(2))
        val a = Rewriter.rewrite(a0)
        val id = s"ds=$d q=$q"
        try {
          val eng = engineRows(comp, a)
          val itp = RefInterp.eval(a, RefInterp.Env(ds, ctx, svc))
          if (!Isomorphism.solutionsEqual(eng, itp))
            failures += s"$id DIVERGE\n  algebra: $a0\n  data: ${triples.mkString("; ")}\n" +
              s"  engine(${eng.size}): ${eng.take(8).mkString(" | ")}\n" +
              s"  interp(${itp.size}): ${itp.take(8).mkString(" | ")}"
          if (q % 3 == 0) {
            val peng = engineRows(pcomp, a)
            if (!Isomorphism.solutionsEqual(peng, itp))
              failures += s"$id PERSISTED-STORE DIVERGE\n  algebra: $a0\n" +
                s"  persisted(${peng.size}): ${peng.take(8).mkString(" | ")}\n" +
                s"  interp(${itp.size}): ${itp.take(8).mkString(" | ")}"
          }
          checked += 1
          if (eng.nonEmpty) nonEmpty += 1
        } catch {
          case e: Exception =>
            failures += s"$id CRASH ${e.getClass.getSimpleName}: ${e.getMessage}\n" +
              s"  algebra: $a0\n  data: ${triples.mkString("; ")}"
        }
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pdir))
    }
    assert(failures.isEmpty,
      s"${failures.size} of $checked cases failed:\n" + failures.take(5).mkString("\n\n"))
    assert(checked == NDatasets * QueriesPer)
    // guard against generator degeneration: a meaningful share of random
    // queries must return rows, or the differential is vacuous
    assert(nonEmpty >= checked / 4, s"only $nonEmpty/$checked non-empty results")
  }

  test("serializer→parser round-trip preserves semantics on random algebra trees") {
    // the SERVICE-shipping differential generalized from the fixed corpus:
    // serialize each random tree with AlgebraText, re-parse, and both the
    // original and re-parsed algebra must agree under RefInterp (restricted
    // to the original's in-scope vars — SELECT * projects exactly those).
    // Driver-local only: this leg needs no Spark.
    import graft.parser.{AlgebraText, SparqlParser}
    var checked = 0
    var nonEmpty = 0
    val failures = scala.collection.mutable.ListBuffer[String]()
    for (d <- 0 until NDatasets) {
      val gen = new Gen(baseSeed + 104729L + d * 7919L)
      val triples = gen.quads()
      val ds = RefInterp.Dataset.fromQuads(triples, Set(g))
      // driver-local self-federation: SERVICE legs evaluate their pattern
      // via the interpreter itself (still no Spark in this test)
      val refSvc: ServiceClient = new ServiceClient {
        def execute(endpoint: String, pattern: Algebra,
            vars: Seq[String]): Seq[Map[String, Term]] =
          RefInterp.eval(pattern, RefInterp.Env(ds, ctx, None))
            .map(_.filter(kv => vars.contains(kv._1)))
      }
      val env = RefInterp.Env(ds, ctx, Some(refSvc))
      for (q <- 0 until QueriesPer) {
        val a0 = gen.alg(Depth + gen.rnd.nextInt(2))
        val vis = Algebra.inscope(a0)
        val id = s"ds=$d q=$q"
        try {
          val text = AlgebraText.selectQuery(a0, Nil)
          val parsed = SparqlParser.parse(text)
          val direct = RefInterp.eval(a0, env).map(_.filter(kv => vis(kv._1)))
          val viaText = RefInterp.eval(parsed.algebra, env)
            .map(_.filter(kv => vis(kv._1)))
          if (!Isomorphism.solutionsEqual(direct, viaText))
            failures += s"$id ROUND-TRIP DIVERGE\n  algebra: $a0\n  text: $text\n" +
              s"  direct(${direct.size}): ${direct.take(8).mkString(" | ")}\n" +
              s"  viaText(${viaText.size}): ${viaText.take(8).mkString(" | ")}"
          checked += 1
          if (direct.nonEmpty) nonEmpty += 1
        } catch {
          case e: Exception =>
            failures += s"$id CRASH ${e.getClass.getSimpleName}: ${e.getMessage}\n" +
              s"  algebra: $a0\n  text: ${scala.util.Try(
                AlgebraText.selectQuery(a0, Nil)).getOrElse("<serialize failed>")}"
        }
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} of $checked cases failed:\n" + failures.take(5).mkString("\n\n"))
    assert(checked == NDatasets * QueriesPer)
    assert(nonEmpty >= checked / 4, s"only $nonEmpty/$checked non-empty results")
  }
}
