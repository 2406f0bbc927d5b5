package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** A dictionary-encoded RDF quad store backed by two DataFrames.
  *
  *  - `quads(s, p, o, g: Long, onum: Double)` — one row per quad, all positions
  *    encoded as packed 64-bit ids ([[graft.model.TermId]]); `onum` denormalizes the
  *    numeric value of the object (when the object is a numeric literal) so value
  *    filters and aggregations run columnar-ly without a dictionary join.
  *  - `terms(id, kind, lex, dt, lang, num)` — dictionary rows for ids whose terms
  *    could not be inlined in the id itself.
  *
  * Spark-side equivalent of the reference's store protocol (kasei/kineo
  * `Sources/Kineo/QuadStore/QuadStore.swift:62-88` — id-space scans + late
  * materialization via `term(from:)`): here "late materialization" is a left join
  * against `terms` at the edge of the plan.
  */
final case class RdfStore(
    quads: DataFrame,
    terms: DataFrame,
    scheme: IriScheme,
    defaultGraphs: Seq[Long]) {

  def spark: SparkSession = quads.sparkSession

  /** Ids of all named graphs (distinct g values). Small by construction. */
  lazy val graphIds: Seq[Long] =
    quads.select("g").distinct().collect().map(_.getLong(0)).toSeq

  def idOf(t: Term): Option[Long] =
    scheme.tryInline(t).orElse {
      val r = TermRow.toRow(t)
      terms.filter(col("kind") === r.get(0) && col("lex") === r.get(1) &&
        col("dt") <=> r.get(2) && col("lang") <=> r.get(3))
        .select("id").collect().headOption.map(_.getLong(0))
    }
}

object StoreEncoder {
  import TermId._

  val termsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false) +: TermRow.schema.fields.toSeq)

  /** Encode a DataFrame of struct-space quads (columns s,p,o,g of [[TermRow.schema]])
    * into an [[RdfStore]]. Dictionary ids are assigned with a distinct+zipWithIndex
    * pass (one extra shuffle at load; deterministic within a build).
    */
  def encode(structQuads: DataFrame, scheme: IriScheme): RdfStore = {
    val spark = structQuads.sparkSession
    val inl = udf { (r: org.apache.spark.sql.Row) =>
      if (r == null) None else scheme.tryInline(TermRow.fromRow(r)).map(Long.box)
    }
    val withInline = structQuads
      .withColumn("sid", inl(col("s"))).withColumn("pid", inl(col("p")))
      .withColumn("oid", inl(col("o"))).withColumn("gid", inl(col("g")))
      .localCheckpoint()

    val positions = Seq("s", "p", "o", "g")
    val dictViews = positions.map(pos =>
        withInline.filter(col(pos + "id").isNull).select(col(pos).as("t")))
      .reduce(_ unionByName _).distinct()

    val terms = dictFromViews(dictViews, scheme)

    var q = withInline
    for (pos <- positions) {
      val d = terms.select(struct(col("kind"), col("lex"), col("dt"), col("lang"),
        col("num")).as("t"), col("id").as("__did"))
      q = q.join(d, q(pos) <=> d("t"), "left")
        .withColumn(pos + "id", coalesce(col(pos + "id"), col("__did")))
        .drop("t", "__did")
    }
    val quads = q.select(
      col("sid").as("s"), col("pid").as("p"), col("oid").as("o"), col("gid").as("g"),
      col("o.num").as("onum"))
    val graphs = quads.select("g").distinct().collect().map(_.getLong(0)).toSeq
    RdfStore(quads, terms, scheme, graphs)
  }

  /** Assign dictionary ids to distinct struct-space term views. */
  def dictFromViews(dictViews: DataFrame, scheme: IriScheme): DataFrame = {
    val spark = dictViews.sparkSession
    val rdd = dictViews.rdd.zipWithIndex().map { case (r, idx) =>
      val t = TermRow.fromRow(if (r.schema.fields.length == 1) r.getStruct(0) else r)
      val tg = dictTag(t)
      org.apache.spark.sql.Row.fromSeq(make(tg, idx) +: TermRow.toRow(t).toSeq)
    }
    spark.createDataFrame(rdd, termsSchema)
  }
}
