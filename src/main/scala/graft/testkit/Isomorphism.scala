package graft.testkit

import graft.model._

/** Blank-node-isomorphism equality for graphs / query results — the comparison the
  * W3C test harness needs (reference `QueryResult.==`, kasei/kineo
  * `Sources/Kineo/QuadStore/QuadStore.swift:405-580`): two graphs are equal when a
  * bijection between their blank nodes maps one onto the other.
  *
  * Signature-refinement first (degree/ground-neighborhood hashing), then
  * backtracking over the remaining candidates — test-kit scale, driver-side.
  */
object Isomorphism {

  type Triple = (Term, Term, Term)

  def isomorphic(a: Seq[Triple], b: Seq[Triple]): Boolean = {
    if (a.size != b.size) return false
    val (aGround, aBn) = a.partition(t => !hasBNode(t))
    val (bGround, bBn) = b.partition(t => !hasBNode(t))
    if (aGround.toSet != bGround.toSet) return false
    if (aBn.isEmpty && bBn.isEmpty) return true

    val aNodes = bnodes(aBn)
    val bNodes = bnodes(bBn)
    if (aNodes.size != bNodes.size) return false

    // signature: multiset of ground-context positions the bnode appears in
    def sig(ts: Seq[Triple])(n: BNode): Map[String, Int] =
      ts.flatMap { case (s, p, o) =>
        val ss = Seq.newBuilder[String]
        if (s == n) ss += s"S|${ground(p)}|${ground(o)}"
        if (o == n) ss += s"O|${ground(s)}|${ground(p)}"
        ss.result()
      }.groupBy(identity).view.mapValues(_.size).toMap
    val aSig = aNodes.map(n => n -> sig(aBn)(n)).toMap
    val bSig = bNodes.map(n => n -> sig(bBn)(n)).toMap

    def candidates(n: BNode): Seq[BNode] = bNodes.filter(m => bSig(m) == aSig(n))

    val ordered = aNodes.sortBy(n => candidates(n).size)
    val bSet = bBn.toSet

    def subst(t: Triple, m: Map[BNode, BNode]): Triple = {
      def f(x: Term): Term = x match { case bn: BNode => m.getOrElse(bn, bn); case o => o }
      (f(t._1), f(t._2), f(t._3))
    }

    def search(i: Int, used: Set[BNode], m: Map[BNode, BNode]): Boolean = {
      if (i == ordered.size) return aBn.map(subst(_, m)).toSet == bSet
      val n = ordered(i)
      candidates(n).exists { c =>
        !used.contains(c) && {
          val m2 = m + (n -> c)
          // prune: all fully-mapped triples must exist in b
          val ok = aBn.forall { t =>
            val s2 = subst(t, m2)
            hasUnmapped(s2, m2.keySet -- Set.empty, aNodes.toSet -- m2.keySet) ||
              bSet.contains(s2)
          }
          ok && search(i + 1, used + c, m2)
        }
      }
    }
    search(0, Set.empty, Map.empty)
  }

  private def hasUnmapped(t: Triple, mapped: Set[BNode], unmapped: Set[BNode]): Boolean =
    Seq(t._1, t._2, t._3).exists { case bn: BNode => unmapped.contains(bn); case _ => false }

  private def hasBNode(t: Triple): Boolean =
    t._1.isInstanceOf[BNode] || t._2.isInstanceOf[BNode] || t._3.isInstanceOf[BNode]

  private def bnodes(ts: Seq[Triple]): Seq[BNode] =
    ts.flatMap(t => Seq(t._1, t._2, t._3)).collect { case b: BNode => b }.distinct

  private def ground(t: Term): String = t match {
    case _: BNode => "_"
    case o => o.toString
  }

  /** Multiset solution equality with bnode bijection (SELECT results).
    *
    * Rows whose values contain NO blank node compare as a plain canonical
    * multiset — only bnode-carrying rows enter the bijection search. Without
    * the split, every row became a fresh bnode subject and a duplicate-heavy
    * result set sent the backtracker factorial (the r11 fuzzer found a
    * cartesian-shaped case that pinned a core for half an hour). */
  def solutionsEqual(a: Seq[Map[String, Term]], b: Seq[Map[String, Term]]): Boolean = {
    if (a.size != b.size) return false
    def hasBn(row: Map[String, Term]) = row.valuesIterator.exists(_.isInstanceOf[BNode])
    val (aBn, aG) = a.partition(hasBn)
    val (bBn, bG) = b.partition(hasBn)
    def canon(rows: Seq[Map[String, Term]]): Seq[String] =
      rows.map(_.toSeq.sortBy(_._1).map { case (v, t) => s"$v=$t" }
        .mkString("\u0001")).sorted
    if (canon(aG) != canon(bG)) return false
    if (aBn.isEmpty && bBn.isEmpty) return true
    // encode the bnode rows as a graph: one fresh subject per row, var → object
    def toTriples(rows: Seq[Map[String, Term]], tag: String): Seq[Triple] =
      rows.zipWithIndex.flatMap { case (row, i) =>
        row.toSeq.map { case (v, t) => (BNode(s"${tag}row$i"), Iri(s"urn:v:$v"), t) }
      }
    isomorphic(toTriples(aBn, "a"), toTriples(bBn, "b"))
  }
}
