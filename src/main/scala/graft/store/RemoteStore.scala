package graft.store

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.algebra._
import graft.engine.ServiceClient
import graft.model._
import graft.sources.RdfIO

/** Remote quad stores (reference: endpoint-backed
  * `QuadStore/SPARQLClientQuadStore.swift:10-216` and Triple Pattern Fragments
  * `QuadStore/TriplePatternFragmentQuadStore.swift:22-386`).
  *
  * Spark-first recast: the reference evaluates each quad-pattern scan remotely
  * per call; at cluster scale the right shape is a *snapshot ingest* — page the
  * remote data down once, dictionary-encode it, and run every query against the
  * local id-space store. Both entry points below land in a normal [[RdfStore]],
  * so the whole engine (statistics, fast paths, W3C runner) works unchanged on
  * remote data.
  */
object RemoteStore {

  private val quadStructSchema = StructType(Seq("s", "p", "o", "g").map(n =>
    StructField(n, TermRow.schema, nullable = true)))

  /** Snapshot a SPARQL endpoint into a store via paged `SELECT ?s ?p ?o`.
    *
    * Paging uses ORDER BY + LIMIT/OFFSET subselects (the portable protocol
    * idiom). `client` is any [[ServiceClient]] — the HTTP one in deployments,
    * an in-process one in tests.
    */
  def fromEndpoint(spark: SparkSession, endpoint: String, client: ServiceClient,
      pageSize: Int = 10000, maxRows: Long = 10000000L,
      graph: String = "urn:g:remote", scheme: IriScheme = IriScheme.default): RdfStore = {
    val vars = Seq("s", "p", "o")
    val all = scala.collection.mutable.ListBuffer[Row]()
    val g = Iri(graph)
    var offset = 0L
    var done = false
    while (!done && all.size < maxRows) {
      val page = ASlice(
        AOrderBy(BGP(Seq(QuadPattern(V("s"), V("p"), V("o")))),
          Seq(SortKey(EVar("s")), SortKey(EVar("p")), SortKey(EVar("o")))),
        offset, pageSize)
      val rows = client.execute(endpoint, page, vars)
      rows.foreach { m =>
        all += Row(TermRow.toRow(m.getOrElse("s", null)),
          TermRow.toRow(m.getOrElse("p", null)),
          TermRow.toRow(m.getOrElse("o", null)), TermRow.toRow(g))
      }
      offset += rows.size
      done = rows.size < pageSize
    }
    val capped = all.take(
      if (maxRows > Int.MaxValue) Int.MaxValue else maxRows.toInt).toSeq
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(capped, math.max(1, capped.size / 50000)),
      quadStructSchema)
    StoreEncoder.encode(df, scheme)
  }

  /** Triple Pattern Fragments client: fetch one pattern's triples, following
    * hydra paging controls. Fragment pages are N-Triples; control/metadata
    * triples (hydra/void vocabularies) are stripped from the data.
    */
  final class TpfClient(connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000) {
    private val HYDRA = "http://www.w3.org/ns/hydra/core#"
    private val VOID = "http://rdfs.org/ns/void#"

    def fetchPattern(fragmentBase: String, s: Option[Term] = None,
        p: Option[Term] = None, o: Option[Term] = None,
        maxPages: Int = 10000): Seq[(Term, Term, Term)] = {
      def enc(t: Term): String = java.net.URLEncoder.encode(t match {
        case Iri(v) => v
        case other => RdfIO.serializeTerm(other)
      }, "UTF-8")
      val q = Seq(s.map("subject=" + enc(_)), p.map("predicate=" + enc(_)),
        o.map("object=" + enc(_))).flatten.mkString("&")
      var url = if (q.isEmpty) fragmentBase else s"$fragmentBase?$q"
      val out = scala.collection.mutable.ListBuffer[(Term, Term, Term)]()
      var pages = 0
      while (url != null && pages < maxPages) {
        pages += 1
        val body = get(url)
        var next: String = null
        body.linesIterator.foreach { line =>
          RdfIO.parseLine(line).foreach { case (ts, tp, to, _) =>
            tp match {
              case Iri(pi) if pi.startsWith(HYDRA) =>
                if (pi == HYDRA + "next") to match {
                  case Iri(n) => next = n
                  case _ => ()
                }
              case Iri(pi) if pi.startsWith(VOID) => () // dataset metadata
              case _ => out += ((ts, tp, to))
            }
          }
        }
        url = next
      }
      out.toSeq
    }

    private def get(url: String): String = {
      val conn = java.net.URI.create(url).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept", "application/n-triples, text/plain;q=0.5")
      val code = conn.getResponseCode
      if (code / 100 != 2) throw new java.io.IOException(s"TPF $url: HTTP $code")
      val in = conn.getInputStream
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
  }

  /** Snapshot a TPF server (the all-variables fragment) into a store. */
  def fromTpf(spark: SparkSession, fragmentBase: String,
      client: TpfClient = new TpfClient(), graph: String = "urn:g:remote",
      scheme: IriScheme = IriScheme.default): RdfStore = {
    val g = Iri(graph)
    val rows = client.fetchPattern(fragmentBase).map { case (s, p, o) =>
      Row(TermRow.toRow(s), TermRow.toRow(p), TermRow.toRow(o), TermRow.toRow(g))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 50000)),
      quadStructSchema)
    StoreEncoder.encode(df, scheme)
  }
}
