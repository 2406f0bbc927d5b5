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
}
