package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algebra._
import graft.engine.Rewriter
import graft.model._

/** Golden tests for the algebra rewriter (mirrors the reference's rewriter tests,
  * Tests/KineoTests/QueryRewriting.swift:65-269).
  */
class RewriterSpec extends AnyFunSuite {
  def qp(s: Node, p: Node, o: Node) = QuadPattern(s, p, o)
  val pat = BGP(Seq(qp(V("s"), N.iri("urn:p"), V("o"))))

  test("mergeFilters combines nested filters") {
    val e1 = ECall(">", Seq(EVar("o"), EConst(Term.int(1))))
    val e2 = ECall("<", Seq(EVar("o"), EConst(Term.int(9))))
    Rewriter.rewrite(AFilter(e2, AFilter(e1, pat))) match {
      case AFilter(ECall("&&", Seq(a, b)), BGP(_)) => assert(a == e1 && b == e2)
      case other => fail(other.toString)
    }
  }

  test("constant folding with SPARQL semantics") {
    val e = ECall("+", Seq(EConst(Term.int(2)),
      ECall("*", Seq(EConst(Term.int(3)), EConst(Term.int(4))))))
    assert(Rewriter.foldExpr(e) == EConst(Term.int(14)))
    // error-producing constants stay unfolded (row-local error semantics)
    val err = ECall("/", Seq(EConst(Term.int(1)), EConst(Term.int(0))))
    assert(Rewriter.foldExpr(err) == err)
    // nondeterministic functions never fold
    val r = ECall("rand", Seq.empty)
    assert(Rewriter.foldExpr(r) == r)
    // constant strings fold through functions
    assert(Rewriter.foldExpr(ECall("strlen", Seq(EConst(Term.str("abc"))))) ==
      EConst(Term.int(3)))
  }

  test("filter(false) prunes to empty; filter(true) vanishes") {
    assert(Rewriter.isEmpty(Rewriter.rewrite(AFilter(EConst(Term.bool(false)), pat))))
    assert(Rewriter.rewrite(AFilter(EConst(Term.bool(true)), pat)) == pat)
    // a comparison folding to false prunes too
    val f = AFilter(ECall(">", Seq(EConst(Term.int(1)), EConst(Term.int(2)))), pat)
    assert(Rewriter.isEmpty(Rewriter.rewrite(f)))
  }

  test("join/union identities") {
    val unit = ATable(Seq.empty, Seq(Seq.empty))
    val empty = ATable(Seq.empty, Seq.empty)
    assert(Rewriter.rewrite(AJoin(unit, pat)) == pat)
    assert(Rewriter.rewrite(AJoin(pat, unit)) == pat)
    assert(Rewriter.isEmpty(Rewriter.rewrite(AJoin(empty, pat))))
    assert(Rewriter.rewrite(AUnion(empty, pat)) == pat)
    assert(Rewriter.rewrite(AUnion(pat, empty)) == pat)
    // LIMIT 0 → empty
    assert(Rewriter.isEmpty(Rewriter.rewrite(ASlice(pat, 0, 0))))
  }

  test("adjacent BGPs merge through joins") {
    val b2 = BGP(Seq(qp(V("s"), N.iri("urn:q"), V("o2"))))
    Rewriter.rewrite(AJoin(pat, b2)) match {
      case BGP(ps) => assert(ps.size == 2)
      case other => fail(other.toString)
    }
  }

  test("path expansion: link→triple, inv→flip, alt→union, seq→join") {
    assert(Rewriter.rewrite(APath(V("a"), PLink("urn:p"), V("b"))) ==
      BGP(Seq(qp(V("a"), N.iri("urn:p"), V("b")))))
    assert(Rewriter.rewrite(APath(V("a"), PInv(PLink("urn:p")), V("b"))) ==
      BGP(Seq(qp(V("b"), N.iri("urn:p"), V("a")))))
    Rewriter.rewrite(APath(V("a"), PAlt(PLink("urn:p"), PLink("urn:q")), V("b"))) match {
      case AUnion(BGP(_), BGP(_)) => ()
      case other => fail(other.toString)
    }
    Rewriter.rewrite(APath(V("a"), PSeq(PLink("urn:p"), PLink("urn:q")), V("b"))) match {
      case AProject(BGP(ps), vs) =>
        assert(ps.size == 2 && vs.toSet == Set("a", "b"))
      case other => fail(other.toString)
    }
    // recursive paths stay for the fixpoint compiler
    Rewriter.rewrite(APath(V("a"), PPlus(PLink("urn:p")), V("b"))) match {
      case APath(_, PPlus(_), _, _) => ()
      case other => fail(other.toString)
    }
  }

  test("project collapse") {
    val p2 = AProject(AProject(pat, Seq("s", "o")), Seq("s"))
    assert(Rewriter.rewrite(p2) == AProject(pat, Seq("s")))
  }
}
