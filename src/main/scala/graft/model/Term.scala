package graft.model

/** RDF term model.
  *
  * Mirrors the reference engine's term taxonomy (kasei/kineo:
  * `Sources/Kineo/RDF/RDF.swift:161-218` lists the legacy term-type encoding;
  * `Sources/Kineo/SPARQL/Expression.swift:14-26` shows term-kind dispatch) but is
  * re-expressed as a plain Scala ADT. Literals carry their lexical form plus either a
  * datatype IRI or a language tag (rdf:langString).
  */
sealed trait Term extends Product with Serializable {
  def lex: String
}

final case class Iri(value: String) extends Term { def lex: String = value }
final case class BNode(label: String) extends Term { def lex: String = label }
final case class Lit(lexForm: String, datatype: String, lang: String) extends Term {
  def lex: String = lexForm
}

object Term {
  // Common XSD datatype IRIs (values defined by the public XSD/SPARQL specs).
  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val xsdString: String = XSD + "string"
  val xsdBoolean: String = XSD + "boolean"
  val xsdInteger: String = XSD + "integer"
  val xsdInt: String = XSD + "int"
  val xsdDecimal: String = XSD + "decimal"
  val xsdFloat: String = XSD + "float"
  val xsdDouble: String = XSD + "double"
  val xsdDate: String = XSD + "date"
  val xsdDateTime: String = XSD + "dateTime"
  val xsdTime: String = XSD + "time"
  val xsdDuration: String = XSD + "duration"
  val rdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  def str(s: String): Lit = Lit(s, xsdString, null)
  def langStr(s: String, lang: String): Lit = Lit(s, rdfLangString, lang.toLowerCase)
  def int(v: Long): Lit = Lit(v.toString, xsdInteger, null)
  def dbl(v: Double): Lit = Lit(fmtDouble(v), xsdDouble, null)
  def dec(v: BigDecimal): Lit = Lit(v.bigDecimal.toPlainString, xsdDecimal, null)
  def bool(v: Boolean): Lit = Lit(if (v) "true" else "false", xsdBoolean, null)
  def date(epochDay: Long): Lit =
    Lit(java.time.LocalDate.ofEpochDay(epochDay).toString, xsdDate, null)
  def dateTimeMicros(epochUs: Long): Lit = {
    val secs = Math.floorDiv(epochUs, 1000000L)
    val us = Math.floorMod(epochUs, 1000000L)
    val inst = java.time.Instant.ofEpochSecond(secs, us * 1000L)
    val ldt = java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
    val base = ldt.toString // ISO; seconds omitted when zero — normalize below
    val norm = if (base.length == 16) base + ":00" else base
    Lit(norm + "Z", xsdDateTime, null)
  }

  /** Canonical double formatting (avoid Scala's "1.0E7"-style surprises only where
    * they differ from Java; Java Double.toString is deterministic, which is all the
    * dictionary needs).
    */
  def fmtDouble(v: Double): String = java.lang.Double.toString(v)

  val numericTypes: Set[String] =
    Set(xsdInteger, xsdInt, xsdDecimal, xsdFloat, xsdDouble,
      XSD + "long", XSD + "short", XSD + "byte", XSD + "nonNegativeInteger",
      XSD + "positiveInteger", XSD + "negativeInteger", XSD + "nonPositiveInteger",
      XSD + "unsignedLong", XSD + "unsignedInt", XSD + "unsignedShort", XSD + "unsignedByte")

  def isNumeric(t: Term): Boolean = t match {
    case Lit(_, dt, _) => numericTypes.contains(dt)
    case _ => false
  }

  /** Numeric value of a literal, if it parses. */
  def numericValue(t: Term): Option[Double] = t match {
    case Lit(l, dt, _) if numericTypes.contains(dt) =>
      try Some(java.lang.Double.parseDouble(l)) catch { case _: NumberFormatException => None }
    case _ => None
  }

  /** Effective boolean value per SPARQL (reference: Expression.swift:14-26).
    * Returns None for EBV type errors.
    */
  def ebv(t: Term): Option[Boolean] = t match {
    case Lit(l, dt, _) if dt == xsdBoolean => Some(l == "true" || l == "1")
    case Lit(l, dt, _) if numericTypes.contains(dt) =>
      try { val d = java.lang.Double.parseDouble(l); Some(d != 0.0 && !d.isNaN) }
      catch { case _: NumberFormatException => Some(false) }
    case Lit(l, dt, lang) if dt == xsdString || lang != null => Some(l.nonEmpty)
    case _ => None
  }
}
