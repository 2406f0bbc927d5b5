package graft.engine

import graft.algebra.Algebra
import graft.model.Term
import graft.parser.AlgebraText
import graft.sources.SparqlResults

/** SPARQL-protocol HTTP SERVICE client with content negotiation (reference:
  * kasei/kineo `Sources/Kineo/SPARQL/SPARQLClient.swift:25-110,140-189`).
  *
  * Ships the inner pattern as a SELECT query via POST
  * (`application/x-www-form-urlencoded`, the protocol's most interoperable
  * form), negotiates `application/sparql-results+json` →
  * `+xml` → `text/tab-separated-values`, and parses with the
  * [[graft.sources.SparqlResults]] codecs. Driver-side by design — SERVICE
  * result sets are expected small; large federated joins belong in the outer
  * plan (reference ServicePlan is likewise a per-query client call,
  * MaterializedQueryPlan.swift:669-703).
  */
final class HttpServiceClient(connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000) extends ServiceClient {

  private val accept =
    "application/sparql-results+json, application/sparql-results+xml;q=0.9, " +
      "text/tab-separated-values;q=0.8"

  def execute(endpoint: String, pattern: Algebra,
      vars: Seq[String]): Seq[Map[String, Term]] = {
    val query = AlgebraText.selectQuery(pattern, vars)
    val (contentType, body) = post(endpoint, query)
    parseByType(contentType, body)._2
  }

  /** Endpoint-client mode (reference kineo-client,
    * `Sources/kineo-client/main.swift`): POST the user's query text unchanged
    * and return (vars, rows, ask) — `ask` is Some for a boolean (ASK)
    * response, which the bindings codecs cannot represent. */
  def executeQueryText(endpoint: String,
      query: String): (Seq[String], Seq[Map[String, Term]], Option[Boolean]) = {
    val (contentType, body) = post(endpoint, query)
    val mt = contentType.takeWhile(_ != ';').trim.toLowerCase
    val isJson = mt == "application/sparql-results+json" || mt == "application/json"
    val isXml = mt == "application/sparql-results+xml" || mt == "application/xml" ||
      mt == "text/xml"
    if (isJson) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      if (root.has("boolean"))
        return (Seq.empty, Seq.empty, Some(root.get("boolean").asBoolean))
    }
    if (isXml && body.contains("<boolean>"))
      return (Seq.empty, Seq.empty, Some(body.contains("<boolean>true</boolean>")))
    val (vars, rows) = parseByType(contentType, body)
    (vars, rows, None)
  }

  /** Dispatch on the (parameter-stripped) media type. */
  private[engine] def parseByType(contentType: String,
      body: String): (Seq[String], Seq[Map[String, Term]]) = {
    val mt = contentType.takeWhile(_ != ';').trim.toLowerCase
    mt match {
      case "application/sparql-results+json" | "application/json" =>
        SparqlResults.parseJson(body)
      case "application/sparql-results+xml" | "application/xml" | "text/xml" =>
        SparqlResults.parseXml(body)
      case "text/tab-separated-values" => SparqlResults.parseTsv(body)
      case other =>
        throw new IllegalStateException(s"SERVICE: unsupported content type $other")
    }
  }

  private def post(endpoint: String, query: String): (String, String) = {
    val url = java.net.URI.create(endpoint).toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Accept", accept)
    conn.setRequestProperty("Content-Type",
      "application/x-www-form-urlencoded; charset=UTF-8")
    conn.setDoOutput(true)
    val form = "query=" + java.net.URLEncoder.encode(query, "UTF-8")
    val os = conn.getOutputStream
    try os.write(form.getBytes("UTF-8")) finally os.close()
    val code = conn.getResponseCode
    if (code / 100 != 2) {
      val err = Option(conn.getErrorStream).map(readAll).getOrElse("")
      throw new java.io.IOException(s"SERVICE <$endpoint> HTTP $code: ${err.take(500)}")
    }
    val ct = Option(conn.getContentType).getOrElse("application/sparql-results+xml")
    (ct, readAll(conn.getInputStream))
  }

  private def readAll(in: java.io.InputStream): String =
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
}
