package graft.model

/** Deterministic IRI inlining.
  *
  * Two schemes on top of [[TermId]]:
  *
  *  - '''Template IRIs''' (`TAG_IRI_T`): IRIs of the form `urn:t:{table}:{key}` (the
  *    relational→RDF mapping of FIXTURES.md §6) inline as
  *    `(tableNo << 48) | key`, with composite lineitem keys packed as
  *    `orderkey * 8 + linenumber`. Entity IRIs — the join keys of every BGP — thus
  *    never touch the dictionary: ids are computed columnar-ly at load and joins stay
  *    pure Long equi-joins. This generalizes the reference's "common IRIs inline in
  *    the id" trick (kasei/kineo `Sources/Kineo/QuadStore/IdentityMap.swift:19-50`).
  *  - '''Well-known IRIs''' (`TAG_IRI_WK`): a small registered list (predicates,
  *    graph names, rdf/xsd vocabulary) encoded as an index into the registry.
  *
  * The scheme is carried as data (a case class) so executor-side closures see the
  * exact registry the driver used; determinism of encoding only depends on its
  * contents.
  */
final case class IriScheme(tables: IndexedSeq[String], wellKnown: IndexedSeq[String])
    extends Serializable {

  @transient private lazy val tableNo: Map[String, Int] =
    tables.iterator.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
  @transient private lazy val wkNo: Map[String, Int] =
    wellKnown.iterator.zipWithIndex.map { case (s, i) => s -> i }.toMap

  final val TAG_IRI_T = IriScheme.TAG_IRI_T
  final val TAG_IRI_WK = IriScheme.TAG_IRI_WK

  def templateId(table: String, key: Long): Option[Long] =
    tableNo.get(table).collect {
      case no if key >= 0 && key < (1L << 48) =>
        TermId.make(TAG_IRI_T, (no.toLong << 48) | key)
    }

  def tryInlineIri(iri: String): Option[Long] = {
    if (iri.startsWith("urn:t:")) {
      val rest = iri.substring(6)
      val i = rest.lastIndexOf(':')
      if (i > 0) {
        val table = rest.substring(0, i)
        try {
          val key = java.lang.Long.parseLong(rest.substring(i + 1))
          return templateId(table, key)
        } catch { case _: NumberFormatException => () }
      }
    }
    wkNo.get(iri).map(ix => TermId.make(TAG_IRI_WK, ix.toLong))
  }

  /** Decode an inline IRI id back to its lexical form. */
  def decodeIri(id: Long): String = TermId.tag(id) match {
    case TAG_IRI_T =>
      val p = TermId.payload(id)
      val no = (p >>> 48).toInt
      s"urn:t:${tables(no - 1)}:${p & ((1L << 48) - 1)}"
    case TAG_IRI_WK => wellKnown(TermId.payload(id).toInt)
    case t => throw new IllegalArgumentException(s"not an inline IRI tag: $t")
  }

  /** Full inline attempt: template/well-known IRIs, then [[TermId.tryInline]]. */
  def tryInline(t: Term): Option[Long] = t match {
    case Iri(v) => tryInlineIri(v)
    case other => TermId.tryInline(other)
  }

  /** Decode any inline id (IRI or literal) to a Term. */
  def decodeInline(id: Long): Term = TermId.tag(id) match {
    case TAG_IRI_T | TAG_IRI_WK => Iri(decodeIri(id))
    case _ => TermId.decodeInline(id)
  }

  def isInlineTag(t: Int): Boolean = t == TAG_IRI_T || t == TAG_IRI_WK || !TermId.isDictTag(t)
}

object IriScheme {
  final val TAG_IRI_T = 0x03
  final val TAG_IRI_WK = 0x04

  /** Tables of the driver's synthetic TPC-H-ish corpus (TESTDATA.md). */
  val testTables: IndexedSeq[String] = Vector(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  val testWellKnown: IndexedSeq[String] = {
    val cols = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "label"))
    val preds = testTables.flatMap(t => cols.getOrElse(t, Nil).map(c => s"urn:p:$t:$c"))
    val fks = testTables.map(t => s"urn:fk:$t")
    val graphs = testTables.map(t => s"urn:g:$t")
    (preds ++ fks ++ graphs ++ Vector(
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#first",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil")).distinct
  }

  val default: IriScheme = IriScheme(testTables, testWellKnown)
}
