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
    defaultGraphs: Seq[Long],
    /** predicate id → type profile + cardinality. Drives the compiler's id-order
      * sort / no-dictionary-join fast paths, BGP join ordering, and the COUNT
      * statistics shortcut. */
    predProfiles: Map[Long, PredProfile] = Map.empty,
    /** true when every subject/predicate/graph id in the store is inline. */
    spgAllInline: Boolean = false,
    /** FROM NAMED restriction: None = every graph is named (reference
      * StoreDefaultDataset, Query.swift:196-219). */
    namedGraphs: Option[Seq[Long]] = None,
    /** true when `quads` reads a subject-bucketed table (StorePersist.save
      * bucketBy(s) + per-bucket (s,p) sort): scans report
      * HashPartitioning(s)/sorted output, so same-subject BGP joins plan
      * shuffle-free and sort-free — the Spark analogue of the reference's
      * index-ordered merge joins (IDQueryPlan.swift:183-225). */
    bucketedS: Boolean = false,
    /** Characteristic-set statistics loaded from a persisted manifest
      * (None = not persisted; [[charSets]] computes them on demand). */
    charSetStats: Option[Seq[CharSetStat]] = None,
    /** true when a persisted manifest recorded `"charSets":null` — the
      * ANALYZE ran at save time and found the store exceeds the set cap, so
      * the stat is DISABLED: [[charSets]] must not re-run the expensive pass
      * only to re-discover the over-cap (every re-save of an opened over-cap
      * store would otherwise pay two shuffles over all quads for nothing). */
    charSetsDisabled: Boolean = false) {

  def spark: SparkSession = quads.sparkSession

  /** Characteristic sets (Neumann & Moerkotte, ICDE'11; reference analogue:
    * Diomede's COUNT-from-characteristic-sets shortcut, kasei/kineo
    * QuadStore/DiomedeQuadStore.swift:15-97): subjects partitioned by their
    * exact predicate set, with the subject count and per-predicate quad
    * totals of each set. Answers star-shaped COUNT queries statically —
    * exactly, never as an estimate (the compiler refuses shapes the stats
    * can't prove). Computed lazily once per store session; persisted stores
    * load it from the manifest (the ANALYZE-once contract). None = the
    * store exceeded the set cap (pathological heterogeneity) — the stat is
    * disabled and star counts stay dynamic. */
  @transient lazy val charSets: Option[Seq[CharSetStat]] =
    if (charSetsDisabled) None
    else charSetStats.map(Some(_)).getOrElse(RdfStore.computeCharSets(quads))

  /** Explicit ANALYZE: compute characteristic sets NOW and attach them, so
    * star COUNTs on this (in-memory / appended) store answer statically.
    * The compiler only consults [[charSetStats]] — never the lazy
    * [[charSets]] — because query COMPILE must not launch a Spark job as a
    * side effect; this is the user-facing way to opt an un-persisted store
    * in (persisted stores get it automatically at StorePersist.save). An
    * over-cap result marks the stat disabled so re-saves skip the pass. */
  def analyze(): RdfStore = {
    val computed = RdfStore.computeCharSets(quads)
    copy(charSetStats = computed, charSetsDisabled = computed.isEmpty)
  }

  /** Ids of all named graphs (distinct g values). Small by construction. */
  lazy val graphIds: Seq[Long] =
    quads.select("g").distinct().collect().map(_.getLong(0)).toSeq

  /** Dictionary small enough to broadcast into materialization joins
    * (computed once per store; ~60 B/term → 500k ≈ 30 MB). */
  lazy val termsBroadcastable: Boolean = terms.count() <= 500000L

  @transient private lazy val idCache =
    new java.util.concurrent.ConcurrentHashMap[Term, Option[Long]]()

  def idOf(t: Term): Option[Long] =
    scheme.tryInline(t).orElse(idCache.computeIfAbsent(t, t0 => {
      val r = TermRow.toRow(t0)
      terms.filter(col("kind") === r.get(0) && col("lex") === r.get(1) &&
        col("dt") <=> r.get(2) && col("lang") <=> r.get(3))
        .select("id").collect().headOption.map(_.getLong(0))
    }))
}

/** Per-predicate statistics (the ANALYZE output; reference analogue: Diomede's
  * Characteristic Sets, kasei/kineo QuadStore/DiomedeQuadStore.swift:15-97).
  * `oTags`: the distinct id type tags observed in the object position — drives
  * exactly-typed aggregation fast paths (integer vs double family).
  * `decExact`: every numeric object value is captured exactly by the quads'
  * `odec` DECIMAL(38,18) companion — unlocks the exact-decimal aggregation
  * fast path (reference exact decimal accumulators,
  * MaterializedQueryPlan.swift:2303-2354). */
final case class PredProfile(allInline: Boolean, allNumeric: Boolean, count: Long,
    oTags: Set[Int] = Set.empty, decExact: Boolean = false,
    /** Each subject occurs in at most one quad of this predicate (functional
      * property; exact count(distinct s) == count, no estimate). Lets joins
      * propagate exact cardinality bounds: a star join on such predicates'
      * shared subject cannot multiply rows, so the intermediate stays
      * provably small and broadcastable (the reference's cost-model input,
      * QueryPlanCost.swift:55-343, re-expressed as statistics). */
    funcS: Boolean = false,
    /** Distinct subject / object counts for this predicate (0 = unknown, for
      * stores persisted before these stats existed). These are the
      * join-selectivity domains of the Selinger-style BGP join-order DP:
      * |A ⋈_v B| ≈ |A|·|B| / max(dom_A(v), dom_B(v)) — the candidate-plan
      * cost input the reference gets from its planner's enumeration
      * (QueryPlanner.swift:113,399-408; QueryPlanCost.swift:231-248). */
    distS: Long = 0L, distO: Long = 0L)

/** One characteristic set: the subjects whose predicate set is EXACTLY
  * `preds` (sorted ids), how many there are, and — aligned with `preds` —
  * the total quad count each predicate contributes over those subjects.
  * `occ(i) == subjects` proves every member subject carries predicate
  * `preds(i)` exactly once, which is what makes star COUNT(*) answers exact
  * (each matching subject contributes exactly one solution row). */
final case class CharSetStat(preds: Seq[Long], subjects: Long, occ: Seq[Long])

object RdfStore {
  import TermId._
  private val dictTags = Seq(TAG_BLANK, TAG_IRI, TAG_DECIMAL, TAG_DOUBLE, TAG_FLOAT,
    TAG_STRING, TAG_LANG, TAG_TYPED)

  private def isDict(c: org.apache.spark.sql.Column) =
    shiftright(c, PAYLOAD_BITS).bitwiseAND(0xFF).isin(dictTags.map(Integer.valueOf): _*)

  /** One aggregation pass over the quads computing per-predicate type profiles and
    * the global s/p/g inline flag. Cheap relative to load; at cluster scale this is
    * the ANALYZE step persisted next to the data.
    */
  def computeProfiles(quads: DataFrame): (Map[Long, PredProfile], Boolean) = {
    val hasDec = quads.columns.contains("odec")
    val anyDecNull =
      if (hasDec) max(when(col("onum").isNotNull && col("odec").isNull, 1)
        .otherwise(0))
      else max(lit(1)) // no companion column → never decimal-exact
    val perPred = quads.groupBy("p").agg(
      max(when(isDict(col("o")), 1).otherwise(0)).as("anyDict"),
      max(when(col("onum").isNull, 1).otherwise(0)).as("anyNonNum"),
      max(when(isDict(col("s")) || isDict(col("p")) || isDict(col("g")), 1)
        .otherwise(0)).as("anySpgDict"),
      count(lit(1)).as("n"),
      collect_set(shiftright(col("o"), PAYLOAD_BITS).bitwiseAND(0xFF)).as("otags"),
      anyDecNull.as("anyDecNull"),
      count_distinct(col("s")).as("nDistS"),
      count_distinct(col("o")).as("nDistO"))
      .collect()
    val m = perPred.map(r =>
      r.getLong(0) -> PredProfile(r.getInt(1) == 0, r.getInt(2) == 0, r.getLong(4),
        r.getSeq[Long](5).map(_.toInt).toSet,
        decExact = r.getInt(2) == 0 && r.getInt(6) == 0,
        funcS = r.getLong(7) == r.getLong(4),
        distS = r.getLong(7), distO = r.getLong(8))).toMap
    val spg = perPred.forall(_.getInt(3) == 0)
    (m, spg)
  }

  /** Characteristic-set ANALYZE pass: group quads by (s, p) with map-side
    * combine, attach each subject's sorted predicate set, then aggregate
    * per (set, p). Two shuffles over ANALYZE-time data — the standard
    * cluster-scale way to build this stat (the set count is bounded by the
    * schema's predicate-combination diversity, not by data volume).
    * None when the store holds more than `maxSets` distinct sets — a
    * pathologically heterogeneous corpus where the stat would be
    * driver-resident dead weight (Neumann & Moerkotte cap it the same way). */
  def computeCharSets(quads: DataFrame,
      maxSets: Int = 4096): Option[Seq[CharSetStat]] = {
    val sp = quads.groupBy("s", "p").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val subjSet = sp.groupBy("s")
        .agg(sort_array(collect_list(col("p"))).as("preds"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bySet = sp.join(subjSet, "s")
        .groupBy("preds", "p").agg(sum("c").as("occ"))
      val grouped = subjSet.groupBy("preds").agg(count(lit(1)).as("n"))
      // cap BEFORE collecting: a pathological corpus must not be collected
      // onto the driver just to discover it exceeds the cap
      val overCap = grouped.limit(maxSets + 1).count() > maxSets
      val out = if (overCap) None
      else {
        val subjects = grouped.collect()
        val occ = bySet.collect()
          .map(r => (r.getSeq[Long](0), r.getLong(1)) -> r.getLong(2)).toMap
        Some(subjects.map { r =>
          val preds = r.getSeq[Long](0)
          CharSetStat(preds, r.getLong(1), preds.map(p => occ((preds, p))))
        }.toSeq)
      }
      subjSet.unpersist()
      out
    } finally sp.unpersist()
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
      col("o.num").as("onum"),
      // exact-decimal companion: the lexical form parsed at the engine's
      // xsd:decimal working precision; NULL (unparseable / out of range)
      // disables the predicate's decExact flag and with it the fast path
      col("o.lex").try_cast(org.apache.spark.sql.types.DecimalType(38, 18))
        .as("odec"))
      // RDF graphs are SETS of triples: duplicate input quads collapse at
      // load (ids preserve term identity incl. lexical form, so id-tuple
      // dedup IS term dedup; onum/odec are functions of o). One exchange at
      // load time, same family as the dictionary distinct above.
      .dropDuplicates("s", "p", "o", "g")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val graphs = quads.select("g").distinct().collect().map(_.getLong(0)).toSeq
    val (profiles, spg) = RdfStore.computeProfiles(quads)
    RdfStore(quads, terms, scheme, graphs, profiles, spg)
  }

  /** Bulk append (the reference's only mutation: `MutableQuadStoreProtocol
    * .load(version:quads:)`, QuadStore.swift:141-144,170-258): encode new quads
    * reusing the existing dictionary, assign fresh ids past the current maximum
    * for genuinely new terms, and return a new store over the unioned frames.
    */
  def append(store: RdfStore, structQuads: DataFrame): RdfStore = {
    val spark = structQuads.sparkSession
    val scheme = store.scheme
    val inl = udf { (r: org.apache.spark.sql.Row) =>
      if (r == null) None else scheme.tryInline(TermRow.fromRow(r)).map(Long.box)
    }
    val withInline = structQuads
      .withColumn("sid", inl(col("s"))).withColumn("pid", inl(col("p")))
      .withColumn("oid", inl(col("o"))).withColumn("gid", inl(col("g")))
      .localCheckpoint()
    val positions = Seq("s", "p", "o", "g")
    val needed = positions.map(pos =>
        withInline.filter(col(pos + "id").isNull && col(pos).isNotNull)
          .select(col(pos).as("t")))
      .reduce(_ unionByName _).distinct()
    val existing = store.terms.select(
      struct(col("kind"), col("lex"), col("dt"), col("lang"), col("num")).as("t"))
    val fresh = needed.join(existing, needed("t") <=> existing("t"), "left_anti")
    val maxPayload = store.terms
      .agg(max(col("id").bitwiseAND(TermId.PAYLOAD_MASK))).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).getOrElse(-1L)
    val freshTerms = dictFromViews(fresh, scheme, offset = maxPayload + 1)
    val allTerms = store.terms.unionByName(freshTerms)
    var q = withInline
    val d = allTerms.select(struct(col("kind"), col("lex"), col("dt"), col("lang"),
      col("num")).as("t"), col("id").as("__did"))
    for (pos <- positions) {
      q = q.join(d, q(pos) <=> d("t"), "left")
        .withColumn(pos + "id", coalesce(col(pos + "id"), col("__did")))
        .drop("t", "__did")
    }
    val newQuads = q.select(col("sid").as("s"), col("pid").as("p"),
      col("oid").as("o"), col("gid").as("g"), col("o.num").as("onum"),
      col("o.lex").try_cast(org.apache.spark.sql.types.DecimalType(38, 18))
        .as("odec"))
      // set semantics on insert (same contract as encode's load-time dedup):
      // dedup WITHIN the batch, then drop quads already present — an
      // anti-join keyed on the id tuple, so the cost scales with the BATCH,
      // not with a full-store re-shuffle
      .dropDuplicates("s", "p", "o", "g")
      .join(store.quads.select("s", "p", "o", "g"),
        Seq("s", "p", "o", "g"), "left_anti")
    val quads = store.quads.unionByName(newQuads)
    val graphs = quads.select("g").distinct().collect().map(_.getLong(0)).toSeq
    val (profiles, spg) = RdfStore.computeProfiles(quads)
    RdfStore(quads, allTerms, scheme, graphs, profiles, spg)
  }

  /** Assign dictionary ids to distinct struct-space term views. */
  def dictFromViews(dictViews: DataFrame, scheme: IriScheme,
      offset: Long = 0L): DataFrame = {
    val spark = dictViews.sparkSession
    val rdd = dictViews.rdd.zipWithIndex().map { case (r, idx) =>
      val t = TermRow.fromRow(if (r.schema.fields.length == 1) r.getStruct(0) else r)
      val tg = dictTag(t)
      org.apache.spark.sql.Row.fromSeq(make(tg, offset + idx) +: TermRow.toRow(t).toSeq)
    }
    spark.createDataFrame(rdd, termsSchema)
  }
}
