package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.xml.sax.{Attributes, InputSource}
import org.xml.sax.helpers.DefaultHandler
import graft.model._
import graft.store.{RdfStore, StoreEncoder}

/** RDF/XML source (reference: kasei/kineo `Sources/Kineo/RDF/RDFXML.swift:1-541`,
  * re-expressed as a SAX striped-skipping parser instead of a hand-rolled pull
  * parser).
  *
  * Supported grammar: rdf:RDF (or bare node-element) roots, rdf:Description and
  * typed node elements, rdf:about / rdf:ID / rdf:nodeID subjects, property
  * elements with text / rdf:resource / rdf:nodeID / nested node-element objects,
  * property attributes (including rdf:type), rdf:li container items (→ rdf:_N),
  * rdf:parseType="Resource" | "Literal" | "Collection", rdf:datatype, xml:lang
  * and xml:base scoping with relative IRI resolution.
  *
  * Not emitted: the four reification triples for rdf:ID on property elements
  * (the asserted triple itself is emitted).
  *
  * `parse` is a pure function — for many-file corpora, distribute it with
  * `spark.sparkContext.wholeTextFiles(dir).flatMap { case (_, doc) => parse(doc) }`
  * (one task per document; RDF/XML is not line-splittable, so per-file is the
  * correct parallelism unit at scale).
  */
object RdfXml {
  val RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XML_NS = "http://www.w3.org/XML/1998/namespace"

  // ---- serializer -----------------------------------------------------------
  // Beyond the reference: kasei/kineo registers an RDF/XML *parser* only
  // (RDF.swift:58-68 has no application/rdf+xml serializer) — this writer
  // completes the sink side, round-tripped against [[parse]] in RdfIOSpec.
  // Like TurtleWriter, RDF/XML is a non-bulk human/interop format:
  // serialization is driver-side; bulk dumps use the distributed N-Quads
  // writer.

  /** XML-escape element/attribute content. In attribute values CR/TAB/LF
    * must become numeric character references — XML attribute-value
    * normalization (XML 1.0 §3.3.3) turns raw whitespace into spaces on
    * re-parse, so a literal escape-less round-trip would be lossy. Control
    * characters XML 1.0 cannot represent AT ALL (C0 except TAB/LF/CR) throw,
    * in the same declared-limitation style as non-NCName predicates. */
  private def xmlEscape(s: String, attr: Boolean): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' if attr => "&quot;"
    case '\r' if attr => "&#13;"
    case '\t' if attr => "&#9;"
    case '\n' if attr => "&#10;"
    case '\r' => "&#13;" // raw CR in content normalizes to LF on re-parse
    case c if c < 0x20 && c != '\t' && c != '\n' =>
      throw new IllegalArgumentException(
        f"control character U+${c.toInt}%04X is not representable in XML 1.0 " +
          "— this literal cannot be serialized as RDF/XML")
    case c => c.toString
  }

  private def ncStart(c: Char) = c.isLetter || c == '_'
  private def ncChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

  /** Split a predicate IRI into (namespace, NCName local part), taking the
    * longest valid NCName suffix as the local name (maximizes namespace
    * sharing). RDF/XML fundamentally cannot express a predicate whose IRI
    * ends in a non-NCName character (e.g. a trailing '/'): those throw — a
    * limitation of the format itself, not of this writer. */
  private def splitQName(iri: String): (String, String) = {
    var i = iri.length - 1
    while (i >= 0 && ncChar(iri(i))) i -= 1
    var start = i + 1
    // local must START with an NCName start char: advance past digits etc.
    while (start < iri.length && !ncStart(iri(start))) start += 1
    if (start >= iri.length)
      throw new IllegalArgumentException(
        s"predicate IRI <$iri> has no NCName local part — not expressible in RDF/XML")
    (iri.substring(0, start), iri.substring(start))
  }

  private val xsdString = "http://www.w3.org/2001/XMLSchema#string"
  private val langString = RDF_NS + "langString"

  /** Serialize triples to one RDF/XML document: subject-grouped
    * rdf:Description elements (rdf:about / rdf:nodeID), rdf:resource /
    * rdf:nodeID object attributes, literal content with rdf:datatype or
    * xml:lang, namespaces collected once on the root. */
  def serialize(triples: Seq[(Term, Term, Term)]): String = {
    // stable namespace table over the predicates, rdf: reserved
    val nsOf = scala.collection.mutable.LinkedHashMap[String, String](RDF_NS -> "rdf")
    def pfx(ns: String): String =
      nsOf.getOrElseUpdate(ns, s"ns${nsOf.size}")
    val bySubj = triples.groupBy(_._1)
    val sb = new StringBuilder
    val body = new StringBuilder
    for ((subj, ts) <- bySubj.toSeq.sortBy(_._1.toString)) {
      val about = subj match {
        case Iri(v) => s"""rdf:about="${xmlEscape(v, attr = true)}""""
        case BNode(l) => s"""rdf:nodeID="${xmlEscape(l, attr = true)}""""
        case other => throw new IllegalArgumentException(
          s"literal subject not expressible in RDF/XML: $other")
      }
      body ++= s"  <rdf:Description $about>\n"
      for ((_, p, o) <- ts) {
        val pIri = p match {
          case Iri(v) => v
          case other => throw new IllegalArgumentException(
            s"non-IRI predicate: $other")
        }
        val (ns, local) = splitQName(pIri)
        val q = s"${pfx(ns)}:$local"
        val el = o match {
          case Iri(v) => s"""<$q rdf:resource="${xmlEscape(v, attr = true)}"/>"""
          case BNode(l) => s"""<$q rdf:nodeID="${xmlEscape(l, attr = true)}"/>"""
          case Lit(lexF, dt, lang) =>
            val content = xmlEscape(lexF, attr = false)
            if (lang != null && lang.nonEmpty)
              s"""<$q xml:lang="${xmlEscape(lang, attr = true)}">$content</$q>"""
            else if (dt == null || dt == xsdString || dt == langString)
              s"<$q>$content</$q>"
            else
              s"""<$q rdf:datatype="${xmlEscape(dt, attr = true)}">$content</$q>"""
        }
        body ++= s"    $el\n"
      }
      body ++= "  </rdf:Description>\n"
    }
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<rdf:RDF"
    for ((ns, p) <- nsOf)
      sb ++= s"""\n    xmlns:$p="${xmlEscape(ns, attr = true)}""""
    sb ++= ">\n"
    sb ++= body
    sb ++= "</rdf:RDF>\n"
    sb.toString
  }

  /** Parse an RDF/XML document to triples. */
  def parse(doc: String, base: String = ""): Seq[(Term, Term, Term)] = {
    val handler = new Handler(base)
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val p = f.newSAXParser()
    p.parse(new InputSource(new java.io.StringReader(doc)), handler)
    handler.out.toSeq
  }

  /** RFC 3986 relative-reference resolution (shared by Turtle, RDF/XML and the
    * SPARQL parser's BASE handling). Empty ref = the base document sans
    * fragment. */
  def resolve(base: String, ref: String): String = {
    if (ref.isEmpty) return base.takeWhile(_ != '#')
    try {
      if (base.isEmpty) ref
      else new java.net.URI(base).resolve(ref).toString
    } catch { case _: Exception => ref }
  }

  // scalastyle:off cyclomatic.complexity
  private final class Handler(docBase: String) extends DefaultHandler {
    val out = scala.collection.mutable.ListBuffer[(Term, Term, Term)]()

    private sealed trait Frame
    /** A node element: subject + rdf:li counter. */
    private final case class NodeF(subject: Term, var liCounter: Int = 0) extends Frame
    /** A property element awaiting its object. `ptResource`: this frame is the
      * synthetic half of parseType="Resource" and pops with its NodeF pair. */
    private final case class PropF(subject: Term, pred: Iri,
        datatype: Option[String], var text: StringBuilder = new StringBuilder,
        var hasObject: Boolean = false,
        collection: scala.collection.mutable.ListBuffer[Term] = null,
        ptResource: Boolean = false) extends Frame
    /** rdf:parseType="Literal": capture balanced XML as a string. */
    private final case class XmlLitF(subject: Term, pred: Iri,
        sb: StringBuilder = new StringBuilder, var depth: Int = 0) extends Frame

    private val stack = scala.collection.mutable.Stack[Frame]()
    private val baseStack = scala.collection.mutable.Stack[String](
      if (docBase == null) "" else docBase)
    private val langStack = scala.collection.mutable.Stack[String](null)
    private var bn = 0
    private var sawRoot = false
    private def freshBNode(): BNode = { bn += 1; BNode(s"rx$bn") }

    private def attr(atts: Attributes, local: String): Option[String] =
      Option(atts.getValue(RDF_NS, local))

    private def pushScopes(atts: Attributes): Unit = {
      val b = Option(atts.getValue(XML_NS, "base")).orElse(Option(atts.getValue("xml:base")))
      baseStack.push(b.map(resolve(baseStack.top, _)).getOrElse(baseStack.top))
      val l = Option(atts.getValue(XML_NS, "lang")).orElse(Option(atts.getValue("xml:lang")))
      langStack.push(l.getOrElse(langStack.top))
    }

    private def litTerm(lex: String, datatype: Option[String]): Term = datatype match {
      case Some(dt) => Lit(lex, dt, null)
      case None =>
        val lang = langStack.top
        if (lang != null && lang.nonEmpty) Term.langStr(lex, lang) else Term.str(lex)
    }

    /** Property attributes of a node element → literal / type triples. */
    private def propertyAttributes(subj: Term, atts: Attributes): Unit =
      (0 until atts.getLength).foreach { i =>
        val uri = atts.getURI(i); val local = atts.getLocalName(i)
        val qn = atts.getQName(i)
        val isRdfSyntax = uri == RDF_NS &&
          Set("about", "ID", "nodeID", "resource", "parseType", "datatype").contains(local)
        val isXml = uri == XML_NS || qn.startsWith("xml") || qn.startsWith("xmlns")
        if (!isRdfSyntax && !isXml && uri.nonEmpty) {
          if (uri == RDF_NS && local == "type")
            out += ((subj, Iri(RDF_NS + "type"), Iri(resolve(baseStack.top, atts.getValue(i)))))
          else if (uri == RDF_NS && local == "li") () // rdf:li not allowed as attribute
          else out += ((subj, Iri(uri + local), litTerm(atts.getValue(i), None)))
        }
      }

    override def startElement(uri: String, local: String, qName: String,
        atts: Attributes): Unit = {
      stack.headOption match {
        case Some(x: XmlLitF) =>
          // raw re-serialization of nested XML
          x.sb.append('<').append(qName)
          (0 until atts.getLength).foreach(i =>
            x.sb.append(' ').append(atts.getQName(i)).append("=\"")
              .append(escXml(atts.getValue(i))).append('"'))
          x.sb.append('>')
          x.depth += 1
          return
        case _ => ()
      }
      pushScopes(atts)
      if (!sawRoot && uri == RDF_NS && local == "RDF") { sawRoot = true; return }

      val expectNode = stack.headOption match {
        case None => true
        case Some(_: PropF) => true
        case Some(_: NodeF) => false
        case Some(_: XmlLitF) => false // unreachable
      }

      if (expectNode) {
        val subj: Term = attr(atts, "about").map(a => Iri(resolve(baseStack.top, a)))
          .orElse(attr(atts, "ID").map(id => Iri(resolve(baseStack.top, "#" + id))))
          .orElse(attr(atts, "nodeID").map(BNode(_)))
          .getOrElse(freshBNode())
        if (!(uri == RDF_NS && local == "Description"))
          out += ((subj, Iri(RDF_NS + "type"), Iri(uri + local)))
        propertyAttributes(subj, atts)
        stack.headOption match {
          case Some(p: PropF) =>
            if (p.collection != null) p.collection += subj
            else { out += ((p.subject, p.pred, subj)); p.hasObject = true }
          case _ => ()
        }
        stack.push(NodeF(subj))
      } else {
        val nodeF = stack.head.asInstanceOf[NodeF]
        val subj = nodeF.subject
        val pred: Iri =
          if (uri == RDF_NS && local == "li") {
            nodeF.liCounter += 1
            Iri(RDF_NS + "_" + nodeF.liCounter)
          } else Iri(uri + local)
        attr(atts, "parseType") match {
          case Some("Resource") =>
            val b = freshBNode()
            out += ((subj, pred, b))
            stack.push(PropF(subj, pred, None, hasObject = true, ptResource = true))
            stack.push(NodeF(b)) // children are property elements of b
          case Some("Literal") =>
            stack.push(XmlLitF(subj, pred))
          case Some("Collection") =>
            stack.push(PropF(subj, pred, None,
              collection = scala.collection.mutable.ListBuffer[Term]()))
          case _ =>
            val f = PropF(subj, pred, attr(atts, "datatype").map(resolve(baseStack.top, _)))
            attr(atts, "resource").foreach { r =>
              out += ((subj, pred, Iri(resolve(baseStack.top, r)))); f.hasObject = true
            }
            attr(atts, "nodeID").foreach { id =>
              out += ((subj, pred, BNode(id))); f.hasObject = true
            }
            // property attributes on an (empty) property element → implicit bnode
            val hasPropAttrs = (0 until atts.getLength).exists { i =>
              val u = atts.getURI(i); val l = atts.getLocalName(i)
              u.nonEmpty && u != XML_NS &&
                !(u == RDF_NS && Set("ID", "datatype", "resource", "nodeID",
                  "parseType").contains(l))
            }
            if (!f.hasObject && hasPropAttrs) {
              val b = freshBNode()
              out += ((subj, pred, b))
              propertyAttributes(b, atts)
              f.hasObject = true
            }
            stack.push(f)
        }
      }
    }

    override def endElement(uri: String, local: String, qName: String): Unit = {
      stack.headOption match {
        case Some(x: XmlLitF) =>
          if (x.depth > 0) { x.sb.append("</").append(qName).append('>'); x.depth -= 1 }
          else {
            stack.pop()
            out += ((x.subject, x.pred, Lit(x.sb.toString, RDF_NS + "XMLLiteral", null)))
            baseStack.pop(); langStack.pop()
          }
          return
        case _ => ()
      }
      if (stack.isEmpty) return // closing rdf:RDF (or the root node element)
      stack.pop() match {
        case p: PropF if p.collection != null =>
          // rdf:first/rest/nil chain (reference RDFXML collection handling)
          val nil = Iri(RDF_NS + "nil")
          val head: Term =
            p.collection.foldRight(nil: Term) { (item, tail) =>
              val cell = freshBNode()
              out += ((cell, Iri(RDF_NS + "first"), item))
              out += ((cell, Iri(RDF_NS + "rest"), tail))
              cell
            }
          out += ((p.subject, p.pred, head))
        case p: PropF if !p.hasObject =>
          out += ((p.subject, p.pred, litTerm(p.text.toString, p.datatype)))
        case _: PropF => // object already emitted; ignore whitespace text
        case _: NodeF =>
          // parseType="Resource" pushed (PropF, NodeF) for ONE element: its
          // single end-tag pops both
          stack.headOption match {
            case Some(p: PropF) if p.ptResource => stack.pop()
            case _ => ()
          }
      }
      baseStack.pop(); langStack.pop()
    }

    override def characters(ch: Array[Char], start: Int, length: Int): Unit =
      stack.headOption match {
        case Some(x: XmlLitF) => x.sb.appendAll(ch, start, length)
        case Some(p: PropF) if !p.hasObject && p.collection == null =>
          p.text.appendAll(ch, start, length)
        case _ => ()
      }

    private def escXml(s: String): String =
      s.flatMap { case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
        case '"' => "&quot;"; case c => c.toString }
  }
  // scalastyle:on

  private val quadStructSchema = StructType(Seq("s", "p", "o", "g").map(n =>
    StructField(n, TermRow.schema, nullable = true)))

  /** Read one RDF/XML document into a struct-space quad frame. */
  def readDoc(spark: SparkSession, doc: String, base: String = "",
      graph: String = "urn:g:default"): DataFrame = {
    val g = Iri(graph)
    val rows = parse(doc, base).map { case (s, p, o) =>
      Row(TermRow.toRow(s), TermRow.toRow(p), TermRow.toRow(o), TermRow.toRow(g))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)),
      quadStructSchema)
  }

  /** Distributed many-file reader: one parse task per document. */
  def readDir(spark: SparkSession, dir: String,
      graph: String = "urn:g:default"): DataFrame = {
    val g = Iri(graph)
    val rdd = spark.sparkContext.wholeTextFiles(dir).flatMap { case (path, doc) =>
      parse(doc, path).map { case (s, p, o) =>
        Row(TermRow.toRow(s), TermRow.toRow(p), TermRow.toRow(o), TermRow.toRow(g))
      }
    }
    spark.createDataFrame(rdd, quadStructSchema)
  }

  /** Parse + dictionary-encode into a store. */
  def load(spark: SparkSession, doc: String, base: String = "",
      scheme: IriScheme = IriScheme.default): RdfStore =
    StoreEncoder.encode(readDoc(spark, doc, base), scheme)
}
