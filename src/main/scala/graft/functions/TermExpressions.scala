package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String
import graft.model._

/** Native Catalyst expression decoding an inline packed term id to the canonical
  * term-view struct `(kind, lex, dt, lang, num)` — returns NULL for dictionary
  * ids (callers coalesce with the dictionary join).
  *
  * Replaces a Scala UDF on the materialization hot path: `doGenCode` emits a
  * static call, so the expression stays inside whole-stage codegen (no UDF
  * wrapper, no Option boxing). This is the preference order of SURVEY.md §7.3 —
  * built-in > native Expression > UDF.
  */
case class DecodeInlineTerm(child: Expression, scheme: IriScheme)
    extends UnaryExpression {

  override def dataType: DataType = TermRow.schema
  override def nullable: Boolean = true

  override protected def nullSafeEval(id: Any): Any =
    DecodeInlineTerm.decode(id.asInstanceOf[Long], scheme)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemeRef = ctx.addReferenceObj("graftScheme", scheme, classOf[IriScheme].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.DecodeInlineTerm.decode($c, $schemeRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeInlineTerm =
    copy(child = newChild)
}

object DecodeInlineTerm {
  /** Static decode callable from generated code. Null → dictionary id. */
  def decode(id: Long, scheme: IriScheme): InternalRow = {
    val tag = TermId.tag(id)
    if (!scheme.isInlineTag(tag)) return null
    val t = scheme.decodeInline(id)
    t match {
      case Iri(v) =>
        new GenericInternalRow(Array[Any](TermRow.KIND_IRI, UTF8String.fromString(v),
          null, null, null))
      case BNode(l) =>
        new GenericInternalRow(Array[Any](TermRow.KIND_BLANK, UTF8String.fromString(l),
          null, null, null))
      case lit @ Lit(l, dt, lang) =>
        val num: Any = Term.numericValue(lit).map(Double.box).orNull
        new GenericInternalRow(Array[Any](TermRow.KIND_LITERAL,
          UTF8String.fromString(l), UTF8String.fromString(dt),
          if (lang == null) null else UTF8String.fromString(lang), num))
    }
  }

  /** Column-level API. */
  def apply(c: Column, scheme: IriScheme): Column =
    ColumnBridge.column(DecodeInlineTerm(ColumnBridge.expression(c), scheme))
}
