package graft.engine

import graft.algebra._
import graft.model.Term

/** SPARQL-specific algebra rewrites, run before DataFrame compilation
  * (reference `SPARQLQueryRewriter`, kasei/kineo
  * `Sources/Kineo/SPARQL/QueryRewriting.swift:29-48`). Only the rules that need
  * SPARQL semantics live here — pushdowns, limits, column pruning etc. are left
  * to Catalyst, which sees the compiled plan (SURVEY.md §4.1 disposition).
  *
  *  - mergeFilters:        Filter(e2, Filter(e1, x)) → Filter(e1 && e2, x)
  *  - constant folding:    evaluate deterministic constant expressions with
  *    SPARQL error semantics (QueryRewriting.swift:352-398)
  *  - constant algebra:    Filter(false,x) → ∅; Filter(true,x) → x; join with the
  *    unit table → x; union with ∅ → x (QueryRewriting.swift:322-350)
  *  - path expansion:      link→triple, inverse→flip, alt→union, seq→join
  *    (QueryRewriting.swift:278-293)
  *  - project collapse:    Project(Project(x, a), b) → Project(x, b)
  */
object Rewriter {

  def rewrite(a: Algebra): Algebra = fixpoint(a, 10)

  private def fixpoint(a: Algebra, fuel: Int): Algebra = {
    val r = pass(a)
    if (r == a || fuel <= 0) r else fixpoint(r, fuel - 1)
  }

  private val emptyTable = ATable(Seq.empty, Seq.empty)
  private val unitTable = ATable(Seq.empty, Seq(Seq.empty))

  def isEmpty(a: Algebra): Boolean = a match {
    case ATable(_, rows) => rows.isEmpty
    case _ => false
  }
  def isUnit(a: Algebra): Boolean = a match {
    case ATable(vs, rows) => vs.isEmpty && rows.size == 1
    case _ => false
  }

  // scalastyle:off cyclomatic.complexity
  private def pass(a: Algebra): Algebra = a match {
    // bottom-up
    case BGP(ps) => BGP(ps)
    case APath(s, p, o, g) => expandPath(s, p, o, g)

    case AJoin(l0, r0) =>
      val l = pass(l0); val r = pass(r0)
      if (isUnit(l)) r
      else if (isUnit(r)) l
      else if (isEmpty(l) || isEmpty(r)) emptyTable
      else (l, r) match {
        case (BGP(a1), BGP(a2)) => BGP(a1 ++ a2) // merge adjacent BGPs
        case _ => AJoin(l, r)
      }

    case AUnion(l0, r0) =>
      val l = pass(l0); val r = pass(r0)
      if (isEmpty(l)) r else if (isEmpty(r)) l else AUnion(l, r)

    case ALeftJoin(l0, r0, e) =>
      val l = pass(l0); val r = pass(r0)
      if (isEmpty(r)) l else ALeftJoin(l, r, e.map(foldExpr))

    case AMinus(l0, r0) =>
      val l = pass(l0); val r = pass(r0)
      if (isEmpty(r) || isEmpty(l)) l else AMinus(l, r)

    case AFilter(e0, c0) =>
      val c = pass(c0)
      val e = foldExpr(e0)
      (constBool(e), c) match {
        case (Some(false), _) => emptyTable
        case (Some(true), _) => c
        case (_, AFilter(e1, inner)) => AFilter(ECall("&&", Seq(e1, e)), inner)
        case (_, _) if isEmpty(c) => emptyTable
        case _ => AFilter(e, c)
      }

    case AExtend(c0, v, e) =>
      val c = pass(c0)
      if (isEmpty(c)) emptyTable else AExtend(c, v, foldExpr(e))

    case AProject(c0, vs) =>
      pass(c0) match {
        case AProject(inner, _) => AProject(inner, vs)
        case c => AProject(c, vs)
      }

    case ADistinct(c) => ADistinct(pass(c))
    case AReduced(c) => AReduced(pass(c))
    case ASlice(c, off, lim) =>
      if (lim == 0) emptyTable else ASlice(pass(c), off, lim)
    case AOrderBy(c, keys) => AOrderBy(pass(c), keys.map(k => k.copy(e = foldExpr(k.e))))
    case AGroup(c, keys, aggs) => AGroup(pass(c), keys, aggs)
    case AWindow(c, fns) => AWindow(pass(c), fns)
    case t: ATable => t
    case AService(ep, c, s) => AService(ep, pass(c), s)
    case e: AEnv => e // compiler-internal splice; opaque to rewriting
  }
  // scalastyle:on

  /** Static property-path expansion (QueryRewriting.swift:278-293). Recursive
    * forms (+ * ? !) stay as APath for the fixpoint/scan compiler.
    */
  private var fresh = 0
  private def expandPath(s: Node, p: PathE, o: Node, g: Node): Algebra = p match {
    case PLink(iri) => BGP(Seq(QuadPattern(s, N.iri(iri), o, g)))
    case PInv(inner) => expandPath(o, inner, s, g)
    case PAlt(a, b) => pass(AUnion(expandPath(s, a, o, g), expandPath(s, b, o, g)))
    case PSeq(a, b) =>
      fresh += 1
      val mid = V(s"__rw_mid$fresh")
      val joined = pass(AJoin(expandPath(s, a, mid, g), expandPath(mid, b, o, g)))
      AProject(joined,
        (Algebra.inscope(joined) - mid.name).toSeq.sorted)
    case other => APath(s, other, o, g)
  }

  /** Fold deterministic constant sub-expressions with SPARQL semantics (errors
    * stay unfolded: the row-local error must surface at eval time, not parse time).
    */
  def foldExpr(e: Expr): Expr = e match {
    case ECall(fn, args0) =>
      val args = args0.map(foldExpr)
      val folded = ECall(fn, args)
      if (args.forall(_.isInstanceOf[EConst]) && !Expr.nondeterministic(folded) &&
        fn != "bound") {
        try EConst(ExprEval.eval(folded, _ => null, ExprEval.Ctx(0L)))
        catch { case _: EvalError => folded }
      } else folded
    case EExists(p, n) => EExists(rewrite(p), n)
    case other => other
  }

  private def constBool(e: Expr): Option[Boolean] = e match {
    case EConst(t) => Term.ebv(t)
    case _ => None
  }
}
