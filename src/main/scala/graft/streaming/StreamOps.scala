package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming operators over the events stream. The reference engine has
  * no streaming surface (SURVEY.md §2.11) — this is the Spark-native extension for
  * continuous pipelines: the batch shapes live in [[graft.pipeline.EventsOps]]; the
  * same logic here runs incrementally with watermarks + state.
  */
object StreamOps {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, n_events: Long, duration_s: Double)

  /** Streaming source over the events parquet directory (one file = one batch in
    * tests; in production this is a kafka/file stream).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.pipeline.EventsOps.normalizeTs(
      spark.readStream.schema(schema).parquet(s"$dir/"))
  }

  /** Tumbling 5-minute windowed counts with a 10-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Stateful sessionization with a 30-minute inactivity gap via
    * flatMapGroupsWithState (emits a session row when the gap closes it).
    */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    val evs = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value")).as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(-1L, -1L, 0L))
          val out = scala.collection.mutable.ListBuffer[SessionOut]()
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st.n == 0L) st = SessionState(t, t, 1L)
            else if (t - st.last > 30L * 60 * 1000) {
              out += SessionOut(uid, st.n, (st.last - st.start) / 1000.0)
              st = SessionState(t, t, 1L)
            } else st = st.copy(last = math.max(st.last, t), n = st.n + 1)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class TransState(lastTs: Long, lastId: Long, lastType: String)
  final case class TransPair(user_id: Long, prev: String, next: String)

  /** Streaming twin of [[graft.pipeline.EventsOps.transitions]]: per-user
    * event-type successor pairs emitted incrementally. ONE keyed state entry
    * per user holding only the LAST event — O(|users|) state independent of
    * stream length, no pairwise work. Within a micro-batch rows sort by the
    * same (ts, event_id) total key as the batch window; across micro-batches
    * the carried last-event state stitches the boundary pair, so the pair
    * multiset equals the batch lead() pass when per-user arrival respects
    * event-time order (the kafka-partition-by-user layout). The downstream
    * matrix aggregate stays the same tiny (prev, next) groupBy. */
  def transitionsStream(spark: SparkSession, events: DataFrame): Dataset[TransPair] = {
    import spark.implicits._
    val evs = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value")).as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[TransState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ListBuffer[TransPair]()
          var st = state.getOption.orNull
          for (e <- sorted) {
            if (st != null) out += TransPair(uid, st.lastType, e.event_type)
            st = TransState(e.ts.getTime, e.event_id, e.event_type)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Streaming exact dedup: drop events whose `event_id` was already seen
    * within the watermark horizon — the incremental twin of the batch
    * exact-dedup (one keyed state store, no pairwise work). The watermark
    * bounds state size, which is what makes this runnable forever: an
    * unbounded `dropDuplicates` would grow state linearly with the stream.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Streaming document quality scoring: the batch quality heuristics
    * ([[graft.pipeline.TextStats.qualityOf]]) applied to a document stream.
    * The scores are pure map-side projections, so the streaming plan is the
    * batch plan — no state store, no watermark, per-micro-batch throughput
    * equals the batch scan rate. This is the shape an ingest-time quality
    * gate runs at: score on arrival, filter before landing. */
  def qualityStream(docsStream: DataFrame): DataFrame =
    graft.pipeline.TextStats.qualityOf(docsStream)

  /** Ingest-time PII scrub: the batch redaction projection applied per
    * micro-batch (stateless, map-side, no watermark — release gating happens
    * at ingest instead of in a later batch sweep). */
  def redactStream(docsStream: DataFrame): DataFrame =
    graft.pipeline.TextStats.redactOf(
      docsStream.select(col("doc_id"), col("text").as("s")))

  /** Ingest-time document chunking: the batch sliding-window chunker
    * ([[graft.pipeline.Curation.chunkOf]]) applied per micro-batch —
    * stateless pipelined explode, no state store, no watermark. Chunks flow
    * to an index/packer as documents arrive. */
  def chunkStream(docsStream: DataFrame, win: Int = 64, overlap: Int = 16): DataFrame =
    graft.pipeline.Curation.chunkOf(docsStream, win, overlap)

  final case class ChunkIn(doc_id: Long, source: String, chunk_idx: Long,
      n_tok: Long, chunk_hash: String)
  final case class PackState(offset: Long)
  final case class PackOut(doc_id: Long, chunk_idx: Long, source: String,
      n_tok: Long, chunk_hash: String, pack_id: Long, pack_off: Long, spans: Boolean)

  /** Streaming sequence packer: the stateful twin of the pack stage of
    * [[graft.pipeline.Curation.chunkPack]]. ONE keyed state entry per source
    * holding only the running token offset (8 bytes — O(|sources|) state,
    * independent of stream length), so pack assignment continues seamlessly
    * across micro-batches and checkpoint restarts. Within a micro-batch rows
    * sort by the same (doc_id, chunk_idx) key as the batch window; across
    * batches the carried offset stitches the boundary, so the output equals
    * the batch packer whenever per-source arrival respects doc order (the
    * partition-by-source ingest layout). Dedup is upstream's concern: this
    * op packs WHAT ARRIVES — compose with [[dedupEvents]]-style
    * watermark-bounded dedup on chunk_hash when the stream carries event
    * time (Spark does not allow chaining a second unbounded stateful dedup
    * in front of this operator in one query). */
  def packStream(spark: SparkSession, chunks: DataFrame,
      budget: Int = 256): Dataset[PackOut] = {
    import spark.implicits._
    val in = chunks.select(col("doc_id"), col("source"), col("chunk_idx"),
      col("n_tok"), col("chunk_hash")).as[ChunkIn]
    in.groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[ChunkIn], state: GroupState[PackState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.doc_id, r.chunk_idx))
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val out = sorted.map { r =>
            val o = PackOut(r.doc_id, r.chunk_idx, src, r.n_tok, r.chunk_hash,
              off / budget, off % budget,
              (off + r.n_tok - 1) / budget > off / budget)
            off += r.n_tok
            o
          }
          state.update(PackState(off))
          out.iterator
      }
  }

  /** Streaming near-duplicate detection against a STATIC corpus: incoming
    * documents are MinHash-signed map-side (per-micro-batch projection — the
    * same zero-shuffle path as the batch operator), band-bucketed, and
    * stream-static joined against the corpus's band table; candidates are
    * verified by exact Jaccard over the two gram arrays. This is the
    * ingest-time gate "is this new doc a near-dup of anything we already
    * hold" — the static side is computed once and reused by every
    * micro-batch.
    *
    * Output: (doc_id, match_id, jaccard) for stream docs with a corpus
    * near-dup at or above `threshold`. */
  def nearDupStream(docsStream: DataFrame, corpus: DataFrame,
      k: Int = 64, bands: Int = 16, shingleW: Int = 3,
      threshold: Double = 0.5, seed: Long = 42, salts: Int = 8): DataFrame = {
    import graft.pipeline.Dedup
    import graft.functions.MinHashSig
    val rowsPerBand = k / bands
    def banded(d: DataFrame) = {
      val sigs = Dedup.shingleArrays(d, shingleW)
        .select(col("doc_id"), col("hs"), MinHashSig(col("hs"), k, seed).as("sig"))
        .filter(col("sig").isNotNull)
      val bandCols = (0 until bands).map { bnd =>
        struct(lit(bnd).as("band"),
          slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand).as("bs"))
      }
      sigs.select(col("doc_id"), col("hs"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("hs"),
          col("bk.band").as("band"), col("bk.bs").as("bs"))
    }
    // static side materialized once (persist), streamed side recomputed per
    // micro-batch — the stream-static join broadcasts nothing and keeps the
    // state-free semantics (no watermark needed: the corpus is fixed)
    val corp = graft.pipeline.ScratchCache.persist(
      banded(corpus)
        .withColumnRenamed("doc_id", "match_id").withColumnRenamed("hs", "mhs"))
    corp.count()
    // SALTED band join (Skew.saltedJoin): a boilerplate-heavy band bucket —
    // one (band, bs) value owned by thousands of near-identical docs — would
    // concentrate a micro-batch's rows on one reducer, and this is the one
    // production hot shape AQE cannot re-plan (streaming plans are fixed per
    // micro-batch; no runtime skew split). The stream side spreads over
    // `salts` sub-keys via the deterministic content salt (retry-safe), the
    // static band table replicates salts× — bounded, it is persisted once
    // and |corp|·salts rows only shuffle, never recompute.
    graft.pipeline.Skew.saltedJoin(banded(docsStream), corp,
      Seq("band", "bs"), salts, "inner")
      .filter(col("doc_id") =!= col("match_id"))
      .select(col("doc_id"), col("match_id"),
        graft.functions.SortedIntersectSize(col("hs"), col("mhs")).as("inter"),
        size(col("hs")).cast("long").as("sa"), size(col("mhs")).cast("long").as("sb"))
      // a pair sharing several bands emits several IDENTICAL rows (state-free
      // at-least-once flagging; an idempotent upsert sink keyed on
      // (doc_id, match_id) absorbs them — a streaming dropDuplicates would
      // hold unbounded state for no semantic gain)
      .withColumn("jaccard", round(col("inter") /
        (col("sa") + col("sb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_id", "match_id", "jaccard")
  }

  /** Stream-stream INTERVAL join: each click attributed to every view by the
    * same user in the preceding `horizonMin` minutes — the classic streaming
    * attribution join. Both sides carry watermarks and the join condition
    * bounds the event-time distance, so Spark can expire join state: a view
    * row is held only until `click_ts > view_ts + horizon` is provably past
    * the watermark. Without the time bound this would be an unbounded-state
    * cross-history join; with it, state is O(horizon × arrival rate) per
    * user — the property that lets the query run forever at 100 TB/day.
    *
    * Output: (user_id, view_id, click_id, lag_s). */
  def attributeClicks(events: DataFrame, horizonMin: Int = 10,
      watermark: String = "20 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
        col("user_id") === col("c_user") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizonMin MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        round((unix_micros(col("click_ts")) - unix_micros(col("view_ts"))) / 1e6, 1)
          .as("lag_s"))
  }

  /** Continuous A/B monitor — the streaming twin of
    * [[graft.pipeline.EventsOps.abTest]]: per event-time window, per-arm
    * purchase-value moments (n, Σmv, Σmv² in exact milli-integers) and the
    * Welch z for that window, emitted when the watermark finalizes it (the
    * sequential-monitoring readout: a dashboard gets one immutable z per
    * window). Same zero-variance guard and micro-rounding as the batch
    * operator; state is one row per open window. */
  def abTestStream(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val e = events.filter(col("event_type") === "purchase")
      .select(col("ts"), pmod(col("user_id"), lit(2L)).as("arm"),
        round(col("value") * 1000).cast("long").as("mv"))
      .withWatermark("ts", watermark)
    val c = e.groupBy(window(col("ts"), windowLen).as("w"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("mv")).otherwise(0L)).as("s_a"),
        sum(when(col("arm") === 0, col("mv") * col("mv")).otherwise(0L)).as("q_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("mv")).otherwise(0L)).as("s_b"),
        sum(when(col("arm") === 1, col("mv") * col("mv")).otherwise(0L)).as("q_b"))
    val mA = col("s_a").cast("double") / col("n_a")
    val mB = col("s_b").cast("double") / col("n_b")
    val se2 = (col("q_a").cast("double") / col("n_a") - mA * mA) / col("n_a") +
      (col("q_b").cast("double") / col("n_b") - mB * mB) / col("n_b")
    // nested CASE: the outer arm-empty guard must decide BEFORE se2 is
    // evaluated (ANSI double division by zero raises, it does not return Inf)
    c.select(col("w.start").as("bucket"), col("n_a"), col("s_a"),
      col("n_b"), col("s_b"),
      when(col("n_a") === 0 || col("n_b") === 0, 0L)
        .otherwise(when(se2 <= 0, 0L)
          .otherwise(round((mA - mB) / sqrt(se2) * 1e6).cast("long")))
        .as("z_micro"))
  }

  /** Continuous cardinality monitor: per event-time window the DISTINCT-USER
    * estimate from the KMV sketch ([[graft.functions.KMVAgg]]) next to the
    * exact count — the streaming shape of per-window "how many uniques"
    * dashboards. The sketch state is k·8 bytes per open window (vs the
    * exact count's full id set — the reason sketches exist in streams); the
    * md5-prefix hash makes the estimate deterministic, so the batch replay
    * in StreamSpec compares it exactly. */
  def cardinalityStream(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours", k: Int = 16): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"),
        col("user_id"))
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(graft.functions.KMVAgg(col("h"), k).as("est_users"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("w.start").as("bucket"), col("est_users"), col("approx_users"))

  /** Drive a streaming query to completion over the static directory (test/demo
    * harness: memory sink + processAllAvailable).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  // ---- streaming RDF ingestion ---------------------------------------------

  /** One streamed quad in struct space (field layout = TermRow.schema). */
  final case class QuadTV(s: graft.engine.TV, p: graft.engine.TV,
      o: graft.engine.TV, g: graft.engine.TV)

  /** Streaming N-Triples/N-Quads source: a text-file stream of lines, parsed
    * distributed per micro-batch into struct-space quads — the incremental
    * twin of [[graft.sources.RdfIO.readNTriples]]. Line-oriented means the
    * parallelism unit is the line, so this scales like the batch reader.
    */
  def quadStream(spark: SparkSession, dir: String,
      defaultGraph: String = "urn:g:default"): DataFrame = {
    import spark.implicits._
    import graft.engine.TV
    spark.readStream.text(dir).as[String].flatMap { line =>
      graft.sources.RdfIO.parseLine(line).map { case (s, p, o, g) =>
        QuadTV(TV.of(s), TV.of(p), TV.of(o),
          TV.of(g.getOrElse(graft.model.Iri(defaultGraph))))
      }
    }.toDF()
  }

  /** Running per-predicate quad counts over the stream (complete mode). */
  def predicateCounts(quads: DataFrame): DataFrame =
    quads.groupBy(col("p.lex").as("predicate")).agg(count(lit(1)).as("n"))

  /** Incremental store maintenance: dictionary-encoding append of each
    * micro-batch into an evolving [[graft.store.RdfStore]] (the streaming twin
    * of the bulk `StoreEncoder.append` mutation path). `onUpdate` receives the
    * store after every batch.
    */
  def appendToStore(quads: DataFrame, initial: graft.store.RdfStore,
      onUpdate: graft.store.RdfStore => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    @volatile var current = initial
    quads.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          current = graft.store.StoreEncoder.append(current, batch)
          onUpdate(current)
        }
      }
      .start()
  }
}
