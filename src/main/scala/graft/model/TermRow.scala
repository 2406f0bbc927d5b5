package graft.model

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The materialized ("view") representation of a term inside a DataFrame: a canonical
  * struct `(kind, lex, dt, lang, num)`.
  *
  *  - `kind`: 1 = blank node, 2 = IRI, 3 = literal
  *  - `lex`:  lexical form (IRI string / bnode label / literal lexical form)
  *  - `dt`:   datatype IRI (literals only; null otherwise)
  *  - `lang`: language tag (language-tagged literals only)
  *  - `num`:  numeric value for numeric literals (accelerator; derivable from lex+dt)
  *
  * Canonical means: equal terms always produce byte-identical structs, so Spark struct
  * equality == RDF term equality and structs can be join/groupBy keys directly (the
  * Spark analogue of the reference's materialized-term plan family,
  * kasei/kineo `Sources/Kineo/SPARQL/MaterializedQueryPlan.swift:11-61`).
  */
object TermRow {
  val KIND_BLANK = 1
  val KIND_IRI = 2
  val KIND_LITERAL = 3

  val schema: StructType = StructType(Seq(
    StructField("kind", IntegerType, nullable = true),
    StructField("lex", StringType, nullable = true),
    StructField("dt", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("num", DoubleType, nullable = true)))

  def toRow(t: Term): Row = t match {
    case null => null
    case BNode(l) => Row(KIND_BLANK, l, null, null, null)
    case Iri(v) => Row(KIND_IRI, v, null, null, null)
    case lit @ Lit(l, dt, lang) =>
      val lg = if (lang == null || lang.isEmpty) null else lang
      Row(KIND_LITERAL, l, dt, lg, Term.numericValue(lit).map(Double.box).orNull)
  }

  def fromRow(r: Row): Term = {
    if (r == null || r.isNullAt(0)) return null
    r.getInt(0) match {
      case KIND_BLANK => BNode(r.getString(1))
      case KIND_IRI => Iri(r.getString(1))
      case KIND_LITERAL => Lit(r.getString(1), r.getString(2), r.getString(3))
    }
  }
}
