package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StructField, StructType}
import graft.model._
import graft.store.{RelToRdf, StoreEncoder}
import graft.testkit.Isomorphism

class TestkitSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark

  def t(s: Term, p: Term, o: Term): (Term, Term, Term) = (s, p, o)
  val name = Iri("urn:name")
  val knows = Iri("urn:knows")

  test("blank-node isomorphism: renamed bnodes are equal") {
    val a = Seq(
      t(BNode("x"), name, Term.str("alice")),
      t(BNode("x"), knows, BNode("y")),
      t(BNode("y"), name, Term.str("bob")))
    val b = Seq(
      t(BNode("n1"), name, Term.str("alice")),
      t(BNode("n1"), knows, BNode("n2")),
      t(BNode("n2"), name, Term.str("bob")))
    assert(Isomorphism.isomorphic(a, b))
    // structurally different: knows edge reversed
    val c = Seq(
      t(BNode("n1"), name, Term.str("alice")),
      t(BNode("n2"), knows, BNode("n1")),
      t(BNode("n2"), name, Term.str("bob")))
    assert(!Isomorphism.isomorphic(a, c))
  }

  test("isomorphism: symmetric bnode cycle needs backtracking") {
    def cycle(tag: String) = Seq(
      t(BNode(tag + "1"), knows, BNode(tag + "2")),
      t(BNode(tag + "2"), knows, BNode(tag + "3")),
      t(BNode(tag + "3"), knows, BNode(tag + "1")))
    assert(Isomorphism.isomorphic(cycle("a"), cycle("b")))
    val broken = Seq(
      t(BNode("b1"), knows, BNode("b2")),
      t(BNode("b2"), knows, BNode("b3")),
      t(BNode("b1"), knows, BNode("b3")))
    assert(!Isomorphism.isomorphic(cycle("a"), broken))
  }

  test("solution multiset equality modulo bnodes") {
    val a = Seq(Map("x" -> (BNode("p"): Term)), Map("x" -> (Term.int(5): Term)))
    val b = Seq(Map("x" -> (Term.int(5): Term)), Map("x" -> (BNode("q"): Term)))
    assert(Isomorphism.solutionsEqual(a, b))
    assert(!Isomorphism.solutionsEqual(a, Seq(Map("x" -> (Term.int(5): Term)))))
  }

  test("bulk append assigns fresh dictionary ids and keeps old ones") {
    val schema = StructType(Seq("s", "p", "o", "g").map(n =>
      StructField(n, TermRow.schema, nullable = true)))
    def quadsDf(quads: Seq[(Term, Term, Term, Term)]) =
      spark.createDataFrame(spark.sparkContext.parallelize(quads.map { case (a, b, c, d) =>
        Row(TermRow.toRow(a), TermRow.toRow(b), TermRow.toRow(c), TermRow.toRow(d))
      }, 1), schema)
    val g = Iri("urn:g:t")
    val store0 = StoreEncoder.encode(quadsDf(Seq(
      (Iri("urn:s1"), name, Term.str("a-very-long-literal-one"), g))), IriScheme.default)
    val n0 = store0.terms.count()
    val store1 = StoreEncoder.append(store0, quadsDf(Seq(
      // one reused dict term, one new dict term, one inline
      (Iri("urn:s2"), name, Term.str("a-very-long-literal-one"), g),
      (Iri("urn:s2"), name, Term.str("another-long-literal-two"), g),
      (Iri("urn:s2"), name, Term.int(7), g))))
    assert(store1.quads.count() == 4)
    val ids = store1.terms.select("id").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length) // no id collisions
    // reused literal resolves to the same id in both generations
    val idOld = store0.idOf(Term.str("a-very-long-literal-one")).get
    val idNew = store1.idOf(Term.str("a-very-long-literal-one")).get
    assert(idOld == idNew)
    assert(store1.idOf(Term.str("another-long-literal-two")).isDefined)
    // set semantics on insert: re-appending existing quads (plus an
    // in-batch duplicate) changes nothing
    val store2 = StoreEncoder.append(store1, quadsDf(Seq(
      (Iri("urn:s2"), name, Term.int(7), g),
      (Iri("urn:s2"), name, Term.int(7), g),
      (Iri("urn:s1"), name, Term.str("a-very-long-literal-one"), g))))
    assert(store2.quads.count() == 4, "duplicate insert must be a no-op")
  }

  test("RANGE frames: engine and reference interpreter agree (asc/desc, dup values, gaps, non-numeric key)") {
    // the fuzzer grammar only generates ROWS frames, so the RANGE path gets
    // its own differential: duplicate values (peers share a frame), a value
    // gap (empty neighborhood side), and a non-numeric key (Spark's
    // null-ordering peer group) — engine vs RefInterp on the same quads
    import graft.algebra._
    import graft.engine.{Compiler, ExprEval, Results}
    import graft.testkit.RefInterp
    val g = Iri("urn:g")
    val valP = Iri("urn:val")
    val quads: Seq[(Term, Term, Term, Term)] = Seq(
      (Iri("urn:s1"), valP, Term.int(1), g),
      (Iri("urn:s2"), valP, Term.int(2), g),
      (Iri("urn:s3"), valP, Term.int(2), g),
      (Iri("urn:s4"), valP, Term.int(5), g),
      (Iri("urn:s5"), valP, Term.int(7), g),
      (Iri("urn:s6"), valP, Term.str("x"), g))
    val schema = StructType(Seq("s", "p", "o", "g").map(n =>
      StructField(n, TermRow.schema, nullable = true)))
    val rows = quads.map { case (s, p, o, gg) =>
      Row(TermRow.toRow(s), TermRow.toRow(p), TermRow.toRow(o), TermRow.toRow(gg)) }
    val store = StoreEncoder.encode(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema),
      IriScheme.default)
    val comp = new Compiler(store, ExprEval.Ctx(nowEpochUs = 0L))
    val ds = RefInterp.Dataset.fromQuads(quads, Set(g))
    val env = RefInterp.Env(ds, ExprEval.Ctx(nowEpochUs = 0L), None)
    for ((fn, asc, frame) <- Seq(
        ("sum", true, Some((-1L, 1L))),
        ("count", true, Some((-1L, 1L))),
        ("sum", false, Some((-1L, 1L))),
        ("min", true, Some((-3L, 0L))),
        ("sum", true, Some((0L, 2L))))) {
      val alg = AWindow(
        BGP(Seq(QuadPattern(V("s"), T(valP), V("v")))),
        Seq(WinSpec("w", fn, Some(EVar("v")), Nil,
          Seq(SortKey(EVar("v"), asc)), frame = frame, range = true)))
      val m = Results.materialize(comp, comp.compile(alg))
      val cols = m.columns
      val eng = m.collect().toSeq.map { r =>
        cols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(i)) None
          else Option(TermRow.fromRow(r.getStruct(i))).map(c -> _)
        }.toMap
      }
      val itp = RefInterp.eval(alg, env)
      assert(graft.testkit.Isomorphism.solutionsEqual(eng, itp),
        s"RANGE $fn asc=$asc frame=$frame\n  engine: ${eng.mkString(" | ")}\n" +
          s"  interp: ${itp.mkString(" | ")}")
    }
  }
}
