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
  val xsdYearMonthDuration: String = XSD + "yearMonthDuration"
  val xsdDayTimeDuration: String = XSD + "dayTimeDuration"
  val durationTypes: Set[String] =
    Set(xsdDuration, xsdYearMonthDuration, xsdDayTimeDuration)
  val rdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  def str(s: String): Lit = Lit(s, xsdString, null)
  def langStr(s: String, lang: String): Lit = Lit(s, rdfLangString, lang.toLowerCase)
  def int(v: Long): Lit = Lit(v.toString, xsdInteger, null)
  def dbl(v: Double): Lit = Lit(fmtDouble(v), xsdDouble, null)
  /** Canonical xsd:decimal lexical form — trailing fraction zeros stripped,
    * bare integral values without a point ("2.50"→"2.5", "13.0"→"13").
    * Must match [[graft.engine.NativeExpr]]'s `canonDec` exactly: the r11
    * whole-engine differential caught the interpreter emitting "2.50" where
    * the compiled cast (and the W3C cast suite) canonicalizes. */
  def dec(v: BigDecimal): Lit = {
    val s = v.bigDecimal.stripTrailingZeros
    val norm = if (s.scale < 0) s.setScale(0) else s
    Lit(norm.toPlainString, xsdDecimal, null)
  }
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

  // ---- xsd:duration value space --------------------------------------------
  // The reference parses durations to (months, seconds)
  // (kasei/kineo RDF.swift:409-474); here the value space is (months, MICROS)
  // — integral micros keep =/< exact and match the engine's dateTime
  // resolution. Fractional seconds beyond 6 digits truncate (both here and in
  // the native column replica, NativeExpr.durParts).
  // Field widths bounded at 7 digits (≈27k years / 10M days) so the
  // months/micros arithmetic can never overflow a Long in either engine;
  // fraction bounded at 9 digits so decimal handling stays exact. Wider
  // fields are a lexical error (consistent with the native replica).
  private val DurRe =
    "^(-)?P(?:(\\d{1,7})Y)?(?:(\\d{1,7})M)?(?:(\\d{1,7})D)?(?:T(?:(\\d{1,7})H)?(?:(\\d{1,7})M)?(?:(\\d{1,7}(?:\\.\\d{1,9})?)S)?)?$".r

  /** Parse an XSD duration lexical form against its (possibly restricted)
    * datatype. None = invalid lexical form. */
  def parseDuration(l: String, dt: String): Option[(Long, Long)] = l match {
    case DurRe(neg, y, mo, d, h, mi, s) =>
      val fields = Seq(y, mo, d, h, mi, s)
      if (fields.forall(_ == null)) None // "P" / "-P" / "PT"
      else if (l.endsWith("T")) None // designator with no time fields
      else if (dt == xsdYearMonthDuration && Seq(d, h, mi, s).exists(_ != null)) None
      else if (dt == xsdDayTimeDuration && (y != null || mo != null)) None
      else {
        def ln(v: String): Long = if (v == null) 0L else v.toLong
        val months = 12L * ln(y) + ln(mo)
        val us = (ln(d) * 86400L + ln(h) * 3600L + ln(mi) * 60L) * 1000000L +
          (if (s == null) 0L
           else BigDecimal(s).bigDecimal.movePointRight(6).longValue())
        val sg = if (neg != null) -1L else 1L
        Some((sg * months, sg * us))
      }
    case _ => None
  }

  /** Duration value (months, micros) of a duration-typed literal. */
  def durationValue(t: Term): Option[(Long, Long)] = t match {
    case Lit(l, dt, _) if durationTypes.contains(dt) => parseDuration(l, dt)
    case _ => None
  }

  /** Canonical xsd:dayTimeDuration literal for a micros value (XSD canonical
    * form: zero components omitted, "PT0S" for zero, fraction trimmed). */
  def dayTimeDurationOfMicros(us: Long): Lit =
    if (us == 0L) Lit("PT0S", xsdDayTimeDuration, null)
    else {
      val n = math.abs(us)
      val days = n / 86400000000L
      val hrs = n % 86400000000L / 3600000000L
      val mins = n % 3600000000L / 60000000L
      val secUs = n % 60000000L
      val sb = new StringBuilder(if (us < 0) "-P" else "P")
      if (days > 0) sb.append(days).append('D')
      if (hrs > 0 || mins > 0 || secUs > 0) {
        sb.append('T')
        if (hrs > 0) sb.append(hrs).append('H')
        if (mins > 0) sb.append(mins).append('M')
        if (secUs > 0) {
          sb.append(secUs / 1000000L)
          val frac = secUs % 1000000L
          if (frac > 0)
            sb.append('.').append(f"$frac%06d".reverse.dropWhile(_ == '0').reverse)
          sb.append('S')
        }
      }
      Lit(sb.toString, xsdDayTimeDuration, null)
    }

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
