package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algebra.Algebra
import graft.engine.LocalServiceClient
import graft.graph.GraphView
import graft.model._
import graft.store.RelToRdf

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark
  val sf = "/root/testdata/sf0.001"
  lazy val store = RelToRdf.cached(spark, sf)
  lazy val gv = new GraphView(store)

  test("out/in traversal over fk edges") {
    // customer 42's nation, then that nation's customers
    val nations = gv.out(Iri("urn:t:customer:42"), Some(Iri("urn:fk:nation")))
      .collect().map(_.getLong(0))
    assert(nations.length == 1)
    val nationIri = store.scheme.decodeIri(nations.head)
    val custs = gv.in(Iri(nationIri), Some(Iri("urn:fk:nation"))).count()
    assert(custs >= 1) // at least customer 42 (suppliers share the predicate)
  }

  test("graphx entity graph has fk edges and computes components") {
    val g = gv.graphx
    // fk quads: nation->region 25, customer->nation 150, supplier->nation 10,
    // orders->customer 1500, lineitem->{orders,part,supplier} 18000
    assert(g.edges.count() == 25 + 150 + 10 + 1500 + 18000)
    val cc = gv.connectedComponents()
    assert(cc.count() > 0)
    // everything reachable through the fk web collapses into few components
    assert(cc.select("component").distinct().count() < 50)
  }

  test("federated SERVICE between two local stores") {
    val eng = new GraftEngine(store,
      serviceClient = Some(new LocalServiceClient(Map("urn:svc:self" -> store))))
    val df = eng.query(
      """SELECT ?nm ?rn WHERE {
        |  ?n <urn:p:nation:n_name> ?nm .
        |  SERVICE <urn:svc:self> { ?n <urn:fk:region> ?r . ?r <urn:p:region:r_name> ?rn . }
        |}""".stripMargin)
    assert(df.count() == 25)
    val rows = df.collect().map(r => (r.getStruct(0).getString(1), r.getStruct(1).getString(1)))
    assert(rows.forall { case (nm, rn) => nm.startsWith("NATION_") && rn.nonEmpty })
  }
}
