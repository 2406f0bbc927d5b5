package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, functions => F}
import graft.model.{Iri, Term}
import graft.store.RdfStore

/** Graph-navigation API over a quad store.
  *
  * Two layers, mirroring the reference's `GraphProtocol`/`GraphVertexProtocol`/
  * `GraphAPI` (kasei/kineo `Sources/Kineo/QuadStore/Graph.swift:11-80`):
  *
  *  - DataFrame traversal helpers (neighbors, incoming/outgoing edges, rdf:List
  *    walking) — id-space, lazy, composable with the query engine.
  *  - A GraphX view (`Graph[VertexId=termId, edgeAttr=predicateId]`) for bulk
  *    analytics (PageRank, connected components, …) — the "bulk graph analytics
  *    fit GraphX" half of the design stance.
  */
final class GraphView(store: RdfStore) {

  /** Object-position links only (IRI/bnode objects): the entity graph. */
  private def entityEdges: DataFrame = {
    import graft.model.TermId
    // object tag < 0x10 → IRI or blank node (never a literal)
    store.quads.filter(F.shiftright(F.col("o"), TermId.PAYLOAD_BITS)
      .bitwiseAND(0xFF) < 0x10)
  }

  /** Outgoing neighbor ids of a vertex, optionally restricted to a predicate. */
  def out(term: Term, predicate: Option[Term] = None): DataFrame = {
    val sid = store.idOf(term).getOrElse(Long.MinValue)
    var q = store.quads.filter(F.col("s") === sid)
    for (p <- predicate; pid <- store.idOf(p)) q = q.filter(F.col("p") === pid)
    q.select(F.col("o"))
  }

  /** Incoming neighbor ids of a vertex. */
  def in(term: Term, predicate: Option[Term] = None): DataFrame = {
    val oid = store.idOf(term).getOrElse(Long.MinValue)
    var q = store.quads.filter(F.col("o") === oid)
    for (p <- predicate; pid <- store.idOf(p)) q = q.filter(F.col("p") === pid)
    q.select(F.col("s"))
  }

  /** Walk an rdf:List from its head, returning member ids in order (driver-side
    * pointer chase — rdf:Lists are short by construction; reference:
    * GraphAPI list helpers). */
  def rdfList(head: Term): Seq[Long] = {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val firstId = store.idOf(Iri(rdf + "first")).getOrElse(return Seq.empty)
    val restId = store.idOf(Iri(rdf + "rest")).getOrElse(return Seq.empty)
    val nilId = store.idOf(Iri(rdf + "nil"))
    val out = scala.collection.mutable.ListBuffer[Long]()
    var cur = store.idOf(head)
    var steps = 0
    while (cur.isDefined && !nilId.contains(cur.get) && steps < 10000) {
      val rows = store.quads.filter(F.col("s") === cur.get &&
          (F.col("p") === firstId || F.col("p") === restId))
        .select("p", "o").collect()
      rows.find(_.getLong(0) == firstId).foreach(r => out += r.getLong(1))
      cur = rows.find(_.getLong(0) == restId).map(_.getLong(1))
      steps += 1
    }
    out.toSeq
  }

  /** GraphX view of the entity graph: vertices = term ids, edges = predicate ids. */
  def graphx: Graph[Long, Long] = {
    val edges: RDD[Edge[Long]] = entityEdges
      .select("s", "o", "p").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getLong(2)))
    Graph.fromEdges(edges, defaultValue = 0L)
  }

  /** PageRank over the entity graph → (termId, rank). */
  def pageRank(tol: Double = 0.001): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    graphx.pageRank(tol).vertices.toDF("id", "rank")
  }

  /** Connected components over the entity graph → (termId, componentId). */
  def connectedComponents(): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    graphx.connectedComponents().vertices.toDF("id", "component")
  }
}
