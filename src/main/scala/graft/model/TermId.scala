package graft.model

/** Packed 64-bit term identifiers.
  *
  * Layout: top byte = type tag, low 56 bits = payload. Values that fit are inlined
  * directly in the id (booleans, integers, dates, UTC dateTimes, short strings), so
  * equality joins, numeric filters and ORDER BY can run on raw ids without touching
  * the dictionary. Terms that don't fit get a dictionary tag and a sequence number
  * assigned at encode time.
  *
  * This reproduces the *capability* of the reference's `PackedTermType` inline-id
  * scheme (kasei/kineo `Sources/Kineo/QuadStore/IdentityMap.swift:19-50`, pack/unpack
  * at `IdentityMap.swift:102-396`) with a layout chosen for Spark: biased payloads so
  * that unsigned id order == value order within a tag, and UTF-8 big-endian inline
  * strings so id order == codepoint order.
  *
  * Tag numeric order follows the SPARQL total term order (unbound < blank < IRI <
  * literal; reference comparator `Sources/Kineo/SPARQL/Expression.swift:903-957`), so
  * sorting by (tag, payload) is already close to the SPARQL ORDER BY order.
  */
object TermId {
  // tags — dictionary-backed kinds
  final val TAG_BLANK    = 0x01
  final val TAG_IRI      = 0x02 // dictionary IRI
  // literal tags (>= 0x10)
  final val TAG_BOOLEAN  = 0x10 // inline 0|1
  final val TAG_INTEGER  = 0x11 // inline biased signed 56-bit
  final val TAG_DECIMAL  = 0x12 // dictionary (num cached in terms table)
  final val TAG_DOUBLE   = 0x13 // dictionary (num cached in terms table)
  final val TAG_FLOAT    = 0x14 // dictionary (num cached in terms table)
  final val TAG_DATE     = 0x15 // inline biased epochDay
  final val TAG_DATETIME = 0x16 // inline biased epochMicros (UTC, µs precision)
  final val TAG_TIME     = 0x17 // inline micros-of-day
  final val TAG_STR_INL  = 0x18 // inline UTF-8 <= 7 bytes, big-endian, NUL-padded
  final val TAG_STRING   = 0x19 // dictionary xsd:string
  final val TAG_LANG     = 0x1A // dictionary language-tagged string
  final val TAG_TYPED    = 0x1B // dictionary other-datatype literal

  final val PAYLOAD_BITS = 56
  final val PAYLOAD_MASK = (1L << PAYLOAD_BITS) - 1
  final val BIAS = 1L << (PAYLOAD_BITS - 1) // signed values stored as v + BIAS

  @inline def tag(id: Long): Int = ((id >>> PAYLOAD_BITS) & 0xFF).toInt
  @inline def payload(id: Long): Long = id & PAYLOAD_MASK
  @inline def make(tag: Int, payload: Long): Long =
    (tag.toLong << PAYLOAD_BITS) | (payload & PAYLOAD_MASK)

  def isDictTag(t: Int): Boolean = t match {
    case TAG_BLANK | TAG_IRI | TAG_DECIMAL | TAG_DOUBLE | TAG_FLOAT |
         TAG_STRING | TAG_LANG | TAG_TYPED => true
    case _ => false
  }

  /** Inline-encode a term if it fits; None → needs dictionary. The rule must be
    * deterministic (same term always encodes the same way) so that equal terms get
    * equal ids without coordination.
    */
  def tryInline(t: Term): Option[Long] =
    // Round-trip gate: inline ONLY terms whose decode reproduces the exact
    // lexical form and datatype. BGP matching is TERM identity, not value
    // identity — "01"^^xsd:integer and "1"^^xsd:integer are different RDF
    // terms that compare value-equal only under FILTER `=`. Without the gate
    // both collapse to one inline id (and xsd:int decodes as xsd:integer),
    // silently conflating terms and rewriting lexical forms on output.
    // Non-canonical forms go to the dictionary, preserving identity.
    rawInline(t).filter(id => decodeInline(id) == t)

  private def rawInline(t: Term): Option[Long] = t match {
    case Lit(l, dt, lang) if lang == null || lang.isEmpty =>
      dt match {
        case Term.xsdBoolean =>
          if (l == "true" || l == "1") Some(make(TAG_BOOLEAN, 1L))
          else if (l == "false" || l == "0") Some(make(TAG_BOOLEAN, 0L))
          else None
        case Term.xsdInteger | Term.xsdInt =>
          try {
            val v = java.lang.Long.parseLong(l)
            if (v > -BIAS && v < BIAS) Some(make(TAG_INTEGER, v + BIAS)) else None
          } catch { case _: NumberFormatException => None }
        case Term.xsdString => tryInlineString(l)
        case Term.xsdDate =>
          try {
            val d = java.time.LocalDate.parse(l).toEpochDay
            Some(make(TAG_DATE, d + BIAS))
          } catch { case _: Exception => None }
        case Term.xsdDateTime => tryInlineDateTime(l)
        case Term.xsdTime =>
          try {
            val lt = java.time.LocalTime.parse(l)
            if (lt.getNano % 1000 == 0) Some(make(TAG_TIME, lt.toNanoOfDay / 1000))
            else None
          } catch { case _: Exception => None }
        case _ => None
      }
    case _ => None
  }

  def tryInlineString(s: String): Option[Long] = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (b.length > 7) None
    else if (b.exists(_ == 0)) None
    else {
      var p = 0L
      var i = 0
      while (i < 7) { p = (p << 8) | (if (i < b.length) b(i) & 0xFFL else 0L); i += 1 }
      Some(make(TAG_STR_INL, p))
    }
  }

  def tryInlineDateTime(l: String): Option[Long] =
    try {
      // inline only UTC ("Z" or no offset, treated as UTC) with <= ms precision
      val (body, utc) =
        if (l.endsWith("Z")) (l.dropRight(1), true)
        else if (l.length > 6 && (l(l.length - 6) == '+' || l(l.length - 6) == '-')) (l, false)
        else (l, true)
      if (!utc) None
      else {
        val ldt = java.time.LocalDateTime.parse(body)
        if (ldt.getNano % 1000 != 0) None
        else {
          val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
          val us = Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
            inst.getNano / 1000L)
          if (us > -BIAS && us < BIAS) Some(make(TAG_DATETIME, us + BIAS)) else None
        }
      }
    } catch { case _: Exception => None }

  /** Decode an inline id back to a term. Caller guarantees !isDictTag(tag(id)). */
  def decodeInline(id: Long): Term = {
    val t = tag(id)
    val p = payload(id)
    t match {
      case TAG_BOOLEAN  => Term.bool(p == 1L)
      case TAG_INTEGER  => Term.int(p - BIAS)
      case TAG_DATE     => Term.date(p - BIAS)
      case TAG_DATETIME => Term.dateTimeMicros(p - BIAS)
      case TAG_TIME =>
        val lt = java.time.LocalTime.ofNanoOfDay(p * 1000)
        Lit(lt.toString, Term.xsdTime, null)
      case TAG_STR_INL  => Term.str(decodeInlineString(p))
      case _ => throw new IllegalArgumentException(s"not an inline tag: $t")
    }
  }

  def decodeInlineString(p: Long): String = {
    val b = new Array[Byte](7)
    var i = 0
    var n = 0
    while (i < 7) {
      val by = ((p >>> (8 * (6 - i))) & 0xFF).toByte
      b(i) = by
      if (by != 0) n = i + 1
      i += 1
    }
    new String(b, 0, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Numeric value directly from an inline id, when the tag is numeric. */
  def inlineNum(id: Long): Option[Double] = tag(id) match {
    case TAG_INTEGER => Some((payload(id) - BIAS).toDouble)
    case TAG_BOOLEAN => None
    case _ => None
  }

  /** Dictionary tag for a term that failed tryInline. */
  def dictTag(t: Term): Int = t match {
    case _: Iri => TAG_IRI
    case _: BNode => TAG_BLANK
    case Lit(_, dt, lang) =>
      if (lang != null && lang.nonEmpty) TAG_LANG
      else dt match {
        case Term.xsdString => TAG_STRING
        case Term.xsdDecimal => TAG_DECIMAL
        case Term.xsdDouble => TAG_DOUBLE
        case Term.xsdFloat => TAG_FLOAT
        case _ => TAG_TYPED
      }
  }
}
