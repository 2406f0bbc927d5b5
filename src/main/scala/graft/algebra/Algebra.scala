package graft.algebra

import graft.model.Term

/** SPARQL algebra ADT.
  *
  * Operator set mirrors the reference's authoritative algebra enumeration
  * (kasei/kineo `Sources/Kineo/SPARQL/QueryRewriting.swift:295-320`, plus `.reduced`
  * handled at `QueryPlanner.swift:766`), re-expressed as a Scala ADT that compiles to
  * DataFrame transformations. Property-path forms follow SPARQL 1.1 §9.
  */
sealed trait Node extends Product with Serializable
final case class V(name: String) extends Node
final case class T(term: Term) extends Node
/** Scan position marker: quads of the dataset's default graph(s); does not bind. */
case object DefaultGraph extends Node

object N {
  import graft.model._
  def iri(s: String): T = T(Iri(s))
  def lit(t: Term): T = T(t)
  def v(s: String): V = V(s)
}

final case class QuadPattern(s: Node, p: Node, o: Node, g: Node = DefaultGraph) {
  def nodes: Seq[(Node, String)] = Seq(s -> "s", p -> "p", o -> "o", g -> "g")
  def vars: Seq[String] = nodes.collect { case (V(n), _) => n }.distinct
}

// ---- expressions -----------------------------------------------------------

sealed trait Expr extends Product with Serializable
final case class EVar(name: String) extends Expr
final case class EConst(t: Term) extends Expr
/** All operators and builtins: fn is the (lowercased) SPARQL name or symbol. */
final case class ECall(fn: String, args: Seq[Expr]) extends Expr
/** FILTER (NOT) EXISTS — compiled as a semi/anti join, not a per-row probe
  * (reference probes per row: `MaterializedQueryPlan.swift:1617-1660`). */
final case class EExists(pattern: Algebra, negated: Boolean) extends Expr

object Expr {
  def freeVars(e: Expr): Set[String] = e match {
    case EVar(n) => Set(n)
    case EConst(_) => Set.empty
    case ECall(_, as) => as.flatMap(freeVars).toSet
    case EExists(_, _) => Set.empty
  }
  def hasExists(e: Expr): Boolean = e match {
    case ECall(_, as) => as.exists(hasExists)
    case EExists(_, _) => true
    case _ => false
  }
  def hasBnode(e: Expr): Boolean = e match {
    case ECall("bnode", _) => true
    case ECall(_, as) => as.exists(hasBnode)
    case _ => false
  }
  def nondeterministic(e: Expr): Boolean = e match {
    case ECall(f, as) =>
      f == "rand" || f == "uuid" || f == "struuid" || f == "bnode" ||
        as.exists(nondeterministic)
    case _ => false
  }
}

// ---- property paths --------------------------------------------------------

sealed trait PathE extends Product with Serializable
final case class PLink(iri: String) extends PathE
final case class PInv(p: PathE) extends PathE
final case class PSeq(a: PathE, b: PathE) extends PathE
final case class PAlt(a: PathE, b: PathE) extends PathE
/** Negated property set: !(fwd1|…|^rev1|…) */
final case class PNeg(fwd: Seq[String], rev: Seq[String] = Nil) extends PathE
final case class PPlus(p: PathE) extends PathE
final case class PStar(p: PathE) extends PathE
final case class PZeroOne(p: PathE) extends PathE

// ---- algebra ---------------------------------------------------------------

sealed trait Algebra extends Product with Serializable

final case class BGP(patterns: Seq[QuadPattern]) extends Algebra
final case class APath(s: Node, path: PathE, o: Node, g: Node = DefaultGraph) extends Algebra
final case class AJoin(l: Algebra, r: Algebra) extends Algebra
final case class ALeftJoin(l: Algebra, r: Algebra, expr: Option[Expr] = None) extends Algebra
final case class AMinus(l: Algebra, r: Algebra) extends Algebra
final case class AUnion(l: Algebra, r: Algebra) extends Algebra
final case class AFilter(expr: Expr, child: Algebra) extends Algebra
final case class AExtend(child: Algebra, v: String, expr: Expr) extends Algebra
final case class AProject(child: Algebra, vars: Seq[String]) extends Algebra
final case class ADistinct(child: Algebra) extends Algebra
final case class AReduced(child: Algebra) extends Algebra
final case class ASlice(child: Algebra, offset: Long = 0, limit: Long = -1) extends Algebra
final case class SortKey(e: Expr, asc: Boolean = true)
final case class AOrderBy(child: Algebra, keys: Seq[SortKey]) extends Algebra
/** out ← fn(expr); fn ∈ count/sum/avg/min/max/sample/group_concat; expr None = COUNT(*). */
final case class AggSpec(out: String, fn: String, e: Option[Expr] = None,
    distinct: Boolean = false, sep: String = " ")
final case class AGroup(child: Algebra, keys: Seq[String], aggs: Seq[AggSpec]) extends Algebra
final case class WinSpec(out: String, fn: String, e: Option[Expr], partBy: Seq[String],
    ordBy: Seq[SortKey], frame: Option[(Long, Long)] = None, arg: Int = 0,
    sep: String = " ",
    /** RANGE frame (value-based bounds over ONE numeric sort key) instead of
      * ROWS. Spark-native extension: the reference throws on RANGE frames
      * (MaterializedQueryPlan.swift:849-852); Spark's rangeBetween supports
      * them directly. */
    range: Boolean = false)
final case class AWindow(child: Algebra, fns: Seq[WinSpec]) extends Algebra
/** Inline VALUES table; None = unbound cell. */
final case class ATable(vars: Seq[String], rows: Seq[Seq[Option[Term]]]) extends Algebra
/** SERVICE: ship the inner pattern to a remote endpoint via a pluggable client
  * (reference ServicePlan, MaterializedQueryPlan.swift:669-703 — a driver-side
  * call, never cluster work). */
final case class AService(endpoint: Node, child: Algebra, silent: Boolean = false)
  extends Algebra
/** INTERNAL — compiler-generated only, never parsed/printed/rewritten: splices
  * an already-compiled relation into a nested compile. The EXISTS substitution
  * device (SPARQL 1.1 §18.6): a FILTER EXISTS pattern that references outer
  * variables beyond its own in-scope set (e.g. inside a nested NOT EXISTS)
  * gets the outer solutions' distinct correlation tuples joined in at its
  * leaves, so inner semi/anti joins see the correlated vars in scope. */
final case class AEnv(key: Int, envVars: Set[String], envCertain: Set[String])
  extends Algebra

object Algebra {
  /** Variables possibly bound by this algebra (reference `inscope`,
    * QueryPlanner.swift:17-27). */
  def inscope(a: Algebra): Set[String] = a match {
    case BGP(ps) => ps.flatMap(_.vars).toSet
    case APath(s, _, o, g) =>
      Seq(s, o, g).collect { case V(n) => n }.toSet
    case AJoin(l, r) => inscope(l) ++ inscope(r)
    case ALeftJoin(l, r, _) => inscope(l) ++ inscope(r)
    case AMinus(l, _) => inscope(l)
    case AUnion(l, r) => inscope(l) ++ inscope(r)
    case AFilter(_, c) => inscope(c)
    case AExtend(c, v, _) => inscope(c) + v
    case AProject(_, vs) => vs.toSet
    case ADistinct(c) => inscope(c)
    case AReduced(c) => inscope(c)
    case ASlice(c, _, _) => inscope(c)
    case AOrderBy(c, _) => inscope(c)
    case AGroup(_, keys, aggs) => keys.toSet ++ aggs.map(_.out)
    case AWindow(c, fns) => inscope(c) ++ fns.map(_.out)
    case ATable(vs, _) => vs.toSet
    case AService(e, c, _) =>
      inscope(c) ++ (e match { case V(n) => Set(n); case _ => Set.empty })
    case AEnv(_, vs, _) => vs
  }

  /** EVERY variable occurrence in the tree — pattern positions, filter and
    * extend expressions, sort keys, aggregate arguments, and the patterns of
    * nested EXISTS. Drives EXISTS correlation: vars of the outer solution
    * that appear anywhere in the EXISTS pattern must correlate, even when
    * they are not in the pattern's own in-scope set. */
  def deepVars(a: Algebra): Set[String] = {
    def ev(e: Expr): Set[String] = e match {
      case EVar(n) => Set(n)
      case ECall(_, as) => as.flatMap(ev).toSet
      case EExists(p, _) => deepVars(p)
      case _ => Set.empty
    }
    a match {
      case BGP(ps) => ps.flatMap(_.vars).toSet
      case APath(s, _, o, g) => Seq(s, o, g).collect { case V(n) => n }.toSet
      case AJoin(l, r) => deepVars(l) ++ deepVars(r)
      case ALeftJoin(l, r, e) => deepVars(l) ++ deepVars(r) ++ e.toSet.flatMap(ev)
      case AMinus(l, r) => deepVars(l) ++ deepVars(r)
      case AUnion(l, r) => deepVars(l) ++ deepVars(r)
      case AFilter(e, c) => ev(e) ++ deepVars(c)
      case AExtend(c, v, e) => deepVars(c) + v ++ ev(e)
      case AProject(c, vs) => deepVars(c) ++ vs
      case ADistinct(c) => deepVars(c)
      case AReduced(c) => deepVars(c)
      case ASlice(c, _, _) => deepVars(c)
      case AOrderBy(c, ks) => deepVars(c) ++ ks.flatMap(k => ev(k.e))
      case AGroup(c, keys, aggs) =>
        deepVars(c) ++ keys ++ aggs.flatMap(s => s.e.toSeq.flatMap(ev)) ++ aggs.map(_.out)
      case AWindow(c, fns) => deepVars(c) ++ fns.flatMap(f =>
        f.e.toSeq.flatMap(ev) ++ f.partBy ++ f.ordBy.flatMap(k => ev(k.e)) :+ f.out)
      case ATable(vs, _) => vs.toSet
      case AService(e, c, _) =>
        deepVars(c) ++ (e match { case V(n) => Set(n); case _ => Set.empty })
      case AEnv(_, vs, _) => vs
    }
  }

  /** FREE variables: vars referenced somewhere in `a` that `a` itself cannot
    * bind before the referencing position evaluates — a filter/extend/sort
    * var outside the child's in-scope set, or any var of a nested EXISTS
    * pattern not supplied by the expression's own child (nested EXISTS
    * correlates against its enclosing rows, so everything it references deep
    * is a potential external need). Drives EXISTS correlation
    * (Compiler.compileExistsPattern): an outer var in this set occurs in a
    * position the in-scope semi-join cannot see — e.g. in-scope in a join's
    * LEFT operand but nested inside the RIGHT — and needs the §18.6
    * substitution env spliced in. Strictly wider than
    * `deepVars(a) -- inscope(a)`, which unions in-scope over both join/union
    * operands and so misses cross-operand needs. */
  def freeDeep(a: Algebra): Set[String] = {
    def ev(e: Expr): Set[String] = e match {
      case EVar(n) => Set(n)
      case ECall(_, as) => as.flatMap(ev).toSet
      case EExists(p, _) => deepVars(p)
      case _ => Set.empty
    }
    a match {
      case BGP(_) | APath(_, _, _, _) | ATable(_, _) | AEnv(_, _, _) =>
        Set.empty
      case AJoin(l, r) => freeDeep(l) ++ freeDeep(r)
      case ALeftJoin(l, r, e) => freeDeep(l) ++ freeDeep(r) ++
        (e.toSet.flatMap(ev) -- inscope(l) -- inscope(r))
      case AMinus(l, r) => freeDeep(l) ++ freeDeep(r)
      case AUnion(l, r) => freeDeep(l) ++ freeDeep(r)
      case AFilter(e, c) => freeDeep(c) ++ (ev(e) -- inscope(c))
      case AExtend(c, _, e) => freeDeep(c) ++ (ev(e) -- inscope(c))
      case AProject(c, _) => freeDeep(c)
      case ADistinct(c) => freeDeep(c)
      case AReduced(c) => freeDeep(c)
      case ASlice(c, _, _) => freeDeep(c)
      case AOrderBy(c, ks) =>
        freeDeep(c) ++ (ks.flatMap(k => ev(k.e)).toSet -- inscope(c))
      case AGroup(c, _, aggs) =>
        freeDeep(c) ++ (aggs.flatMap(_.e.toSeq.flatMap(ev)).toSet -- inscope(c))
      case AWindow(c, fns) => freeDeep(c) ++
        (fns.flatMap(f => f.e.toSeq.flatMap(ev) ++
          f.ordBy.flatMap(k => ev(k.e))).toSet -- inscope(c))
      case AService(_, c, _) => freeDeep(c)
    }
  }

  /** Variables bound in every solution (reference `necessarilyBound`,
    * QueryPlanner.swift:17-27) — drives the equi-join fast path vs the
    * null-tolerant compatibility join (§7.4 risk 1 of SURVEY.md). */
  def certain(a: Algebra): Set[String] = a match {
    case BGP(ps) => ps.flatMap(_.vars).toSet
    case APath(s, _, o, g) => Seq(s, o, g).collect { case V(n) => n }.toSet
    case AJoin(l, r) => certain(l) ++ certain(r)
    case ALeftJoin(l, _, _) => certain(l)
    case AMinus(l, _) => certain(l)
    case AUnion(l, r) => certain(l) intersect certain(r)
    case AFilter(_, c) => certain(c)
    case AExtend(c, _, _) => certain(c) // extend can error → var not certain
    case AProject(c, vs) => certain(c) intersect vs.toSet
    case ADistinct(c) => certain(c)
    case AReduced(c) => certain(c)
    case ASlice(c, _, _) => certain(c)
    case AOrderBy(c, _) => certain(c)
    case AGroup(c, keys, _) => keys.toSet intersect certain(c)
    case AWindow(c, fns) => certain(c) ++ fns.map(_.out)
    case ATable(vs, rows) =>
      vs.zipWithIndex.collect {
        case (v, i) if rows.forall(r => r.lift(i).flatten.isDefined) => v
      }.toSet
    case AService(_, _, _) => Set.empty // remote bindings: no certainty guarantees
    case AEnv(_, _, cs) => cs
  }
}
