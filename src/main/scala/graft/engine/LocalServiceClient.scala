package graft.engine

import graft.algebra.Algebra
import graft.model.Term
import graft.store.RdfStore

/** In-process SERVICE client: federates to other [[RdfStore]]s registered by
  * endpoint IRI (the zero-egress analogue of the reference's HTTP
  * `SPARQLClient`, kasei/kineo `Sources/Kineo/SPARQL/SPARQLClient.swift:25-110`;
  * a network deployment implements [[ServiceClient]] with the SPARQL protocol +
  * [[graft.sources.SparqlResults]] content parsers instead).
  *
  * Executes the inner pattern on the target store and returns bindings
  * driver-side — SERVICE result sets are expected to be small; large federated
  * joins belong in the outer plan.
  */
final class LocalServiceClient(stores: Map[String, RdfStore],
    maxRows: Int = 100000) extends ServiceClient {

  def execute(endpoint: String, pattern: Algebra,
      vars: Seq[String]): Seq[Map[String, Term]] = {
    val store = stores.getOrElse(endpoint,
      throw new IllegalArgumentException(s"unknown SERVICE endpoint: <$endpoint>"))
    val c = new Compiler(store, ExprEval.Ctx(System.currentTimeMillis() * 1000L))
    val df = Results.materialize(c, c.compile(pattern)).limit(maxRows)
    val cols = df.columns
    df.collect().toSeq.map { r =>
      cols.indices.flatMap { i =>
        Option(if (r.isNullAt(i)) null else TV.toTerm(r.getStruct(i)))
          .map(cols(i) -> _)
      }.toMap
    }
  }
}
