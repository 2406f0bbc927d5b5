package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

class StreamSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark
  val sf = "/root/testdata/sf0.001"

  /** Stream dir containing only the events file (file-source streams a directory). */
  lazy val evDir: String = {
    val dir = "/tmp/graft_stream/events"
    // always rewrite: a fixture left by a previous run may predate a testdata
    // regeneration (different values AND a different ts physical type)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").write.mode("overwrite").parquet(dir)
    dir
  }

  def stream() = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(evDir).schema
    graft.pipeline.EventsOps.normalizeTs(
      spark.readStream.schema(schema).parquet(evDir))
  }

  test("streaming windowed counts equal the batch result") {
    val got = StreamOps.runToMemory(
      StreamOps.windowedCounts(stream()), "win_counts", OutputMode.Complete)
      .select(col("window.start").as("bucket"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sorted
    val exp = graft.pipeline.EventsOps.window5m(spark, sf)
      .select("bucket", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sorted
    assert(got.toSeq == exp.toSeq)
  }

  test("stateful sessionization emits closed sessions") {
    val out = StreamOps.runToMemory(
      StreamOps.sessionize(spark, stream()).toDF(), "sessions", OutputMode.Append)
    // exactly one session per user stays open in state, all others are emitted:
    // emitted count == sum(batch n_sessions) - n_users
    val batch = graft.pipeline.EventsOps.sessionize(spark, sf)
    val users = batch.count()
    val totalSessions = batch.agg(sum("n_sessions")).first().getLong(0)
    assert(out.count() == totalSessions - users)
    assert(out.filter(col("duration_s") < 0).count() == 0)
  }

  test("streaming RDF ingest: incremental parse, counts, and store append") {
    val dir = new java.io.File("/tmp/graft_stream/nt_" + System.nanoTime())
    dir.mkdirs()
    def writeFile(name: String, lines: String): Unit = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.writeString(f.toPath, lines)
    }
    writeFile("batch1.nt",
      """<http://ex.org/s1> <http://ex.org/name> "alice" .
        |<http://ex.org/s1> <http://ex.org/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |<http://ex.org/s2> <http://ex.org/name> "bob" .
        |""".stripMargin)

    // running predicate counts over the stream (complete mode)
    val counts = StreamOps.predicateCounts(StreamOps.quadStream(spark, dir.toString))
    val q = counts.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("rdf_counts").start()
    q.processAllAvailable()
    writeFile("batch2.nt",
      """<http://ex.org/s3> <http://ex.org/name> "carol" .
        |<http://ex.org/s3> <http://ex.org/knows> <http://ex.org/s1> .
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()
    val m = spark.table("rdf_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("http://ex.org/name" -> 3L, "http://ex.org/age" -> 1L,
      "http://ex.org/knows" -> 1L), m.toString)

    // incremental dictionary-encoded store append per micro-batch
    val empty = graft.sources.RdfIO.loadTurtle(spark, "")
    @volatile var latest = empty
    val aq = StreamOps.appendToStore(
      StreamOps.quadStream(spark, dir.toString), empty, st => latest = st)
    aq.processAllAvailable()
    aq.stop()
    assert(latest.quads.count() == 5)
    val eng = new GraftEngine(latest)
    val names = eng.query("SELECT ?n WHERE { ?s <http://ex.org/name> ?n }")
      .collect().map(_.getStruct(0).getString(1)).toSet
    assert(names == Set("alice", "bob", "carol"))
  }

  test("streaming exact dedup drops within-watermark duplicates") {
    // a copy of the events dir with every row duplicated: the deduped stream
    // must emit each event_id once (all duplicates arrive in the same batch,
    // well inside the watermark horizon)
    val dir = "/tmp/graft_stream/events_dup"
    // always rewrite: stale fixtures may predate a testdata regeneration
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    ev.union(ev).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val dupStream = graft.pipeline.EventsOps.normalizeTs(
      spark.readStream.schema(schema).parquet(dir))
    val out = StreamOps.runToMemory(
      StreamOps.dedupEvents(dupStream), "dedup_events", OutputMode.Append)
    val distinctIds = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id").distinct().count()
    assert(out.count() == distinctIds)
    assert(out.select("event_id").distinct().count() == distinctIds)
  }

  test("streaming near-dup detection flags stream docs against the static corpus") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 12
    val corpus = Seq(
      (1L, base + "lambda mu nu xi", "en", "srcA", 1L),
      (2L, "completely different words entirely unrelated content here " * 10, "en", "srcA", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val streamRows = Seq(
      (100L, base + "lambda mu nu omicron", "en", "srcB", 1L), // near-dup of 1
      (101L, "yet another disjoint vocabulary nothing shared at all " * 10, "en", "srcB", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = "/tmp/graft_stream/neardup"
    streamRows.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val plan = StreamOps.nearDupStream(
      spark.readStream.schema(schema).parquet(dir), corpus)
    // the band join must be SALTED (Skew.saltedJoin): the analyzed plan
    // carries the salt key — AQE cannot re-plan a skewed streaming join, so
    // a hot band bucket relies on this pre-spread
    assert(plan.queryExecution.analyzed.toString.contains("__graft_salt"),
      "stream-static near-dup band join must carry the salt key")
    val flagged = StreamOps.runToMemory(plan,
      "stream_neardup", OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == Set((100L, 1L)), s"got $flagged")
  }

  test("stream-stream interval join matches the batch attribution result") {
    val got = StreamOps.runToMemory(
      StreamOps.attributeClicks(stream()), "attrib", OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // batch equivalent on the same data
    val e = graft.pipeline.EventsOps.events(spark, sf)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val exp = v.join(c, col("user_id") === col("cu") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select("user_id", "view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.nonEmpty && got.toSeq == exp.toSeq)
  }

  test("watermark drops late rows from append-mode windowed aggregation") {
    import spark.implicits._
    // fresh dir per run: batches are written with mode("append") into
    // subdirectories, so a shared fixture path accumulates parquet parts
    // across runs and breaks the closed-window count on a non-pristine /tmp
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_late").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def write(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(s"$dir/$name")
    // batch 1: one event in the 00:00 window, one far ahead (advances the
    // watermark to 00:50 under the 10-minute delay)
    write("b1", Seq(
      (1L, ts("2024-01-01 00:00:30"), 1L, "wmtest", 1.0, "{}"),
      (2L, ts("2024-01-01 01:00:00"), 1L, "wmtest", 1.0, "{}")))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = graft.pipeline.EventsOps.normalizeTs(
      spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(dir))
    val q = StreamOps.windowedCounts(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_counts").start()
    q.processAllAvailable()
    // batch 2: a LATE row for the already-passed 00:00 window (watermark is
    // 00:50 > window end 00:05 -> must be dropped), plus a fresh row
    write("b2", Seq(
      (3L, ts("2024-01-01 00:01:00"), 1L, "wmtest", 1.0, "{}"),
      (4L, ts("2024-01-01 01:10:00"), 1L, "wmtest", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_counts")
      .select(col("window.start").cast("string"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 00:00 window was emitted when the watermark passed it, counting
    // ONLY the batch-1 row; the late batch-2 row for it was discarded
    assert(rows("2024-01-01 00:00:00") == 1L,
      s"late row leaked into a closed window: $rows")
  }

  test("streaming quality scores equal the batch result") {
    val dir = "/tmp/graft_stream/docs"
    spark.read.parquet(s"$sf/documents.parquet").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val got = StreamOps.runToMemory(
      StreamOps.qualityStream(spark.readStream.schema(schema).parquet(dir)),
      "stream_quality", OutputMode.Append)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val exp = graft.pipeline.TextStats.quality(spark, sf)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got == exp)
  }

  test("streaming transition pairs aggregate to the batch transition matrix") {
    val out = StreamOps.runToMemory(
      StreamOps.transitionsStream(spark, stream()).toDF(),
      "transitions", OutputMode.Append)
    val got = out.groupBy("prev", "next").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exp = graft.pipeline.EventsOps.transitions(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == exp, s"stream pair matrix must equal batch lead() matrix")
  }

  test("streaming PII redaction equals the batch projection") {
    val dir = "/tmp/graft_stream/docs_pii"
    spark.read.parquet(s"$sf/documents.parquet").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val got = StreamOps.runToMemory(
      StreamOps.redactStream(spark.readStream.schema(schema).parquet(dir)),
      "stream_redact", OutputMode.Append)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val exp = graft.pipeline.TextStats.redactOf(
        spark.read.parquet(dir).select(col("doc_id"), col("text").as("s")))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("streaming chunker equals the batch chunk stage") {
    val dir = "/tmp/graft_stream/docs_chunk"
    spark.read.parquet(s"$sf/documents.parquet").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val got = StreamOps.runToMemory(
      StreamOps.chunkStream(spark.readStream.schema(schema).parquet(dir)),
      "stream_chunk", OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getString(4))).toMap
    val exp = graft.pipeline.Curation.chunkOf(spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getString(4))).toMap
    assert(got == exp && got.nonEmpty)
  }

  test("streaming packer: per-source offsets carry ACROSS micro-batches, equals batch pack") {
    // batch-deduped chunk table, split into two files by doc range; with
    // maxFilesPerTrigger=1 the second file arrives in a LATER micro-batch,
    // so equality with the batch packer proves the carried offset state
    // stitches the batch boundary
    val all = graft.pipeline.Curation.chunkPack(spark, sf)
    val chunks = graft.pipeline.Curation.chunkOf(
        spark.read.parquet(s"$sf/documents.parquet"))
      .join(all.select(col("doc_id").as("kd"), col("chunk_idx").as("ki")),
        col("doc_id") === col("kd") && col("chunk_idx") === col("ki"))
      .select("doc_id", "source", "chunk_idx", "n_tok", "chunk_hash")
    val mid = 250L
    val dir = "/tmp/graft_stream/chunks_pack"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // file names order the arrival: part A (low doc ids) lands first
    chunks.filter(col("doc_id") <= mid).orderBy("source", "doc_id", "chunk_idx")
      .coalesce(1).write.parquet(s"$dir/a=1")
    chunks.filter(col("doc_id") > mid).orderBy("source", "doc_id", "chunk_idx")
      .coalesce(1).write.parquet(s"$dir/a=2")
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(dir).schema
    val got = StreamOps.runToMemory(
      StreamOps.packStream(spark,
        spark.readStream.schema(schema).option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1").parquet(dir)).toDF(),
      "stream_pack", OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap
    val exp = all.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap
    assert(got.size == exp.size, s"row counts differ: ${got.size} vs ${exp.size}")
    assert(got == exp, "streaming pack bookkeeping must equal the batch window")
  }

  test("streaming cardinality monitor: KMV estimate matches a batch replay") {
    val got = StreamOps.runToMemory(
      StreamOps.cardinalityStream(stream()), "card_monitor", OutputMode.Complete)
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch replay: same expressions over the same static frame
    val exp = graft.pipeline.EventsOps.events(spark, sf)
      .select(col("ts"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"), col("user_id"))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.KMVAgg(col("h"), 16).as("est"),
        approx_count_distinct("user_id").as("apx"))
      .select(col("w.start"), col("est"), col("apx"))
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp)
    assert(got.nonEmpty)
    // estimates are sane: nonzero where events exist
    got.values.foreach { case (e, a) => assert(e > 0 && a > 0) }
  }

  test("streaming A/B monitor matches a batch replay per window") {
    // Complete mode so every window is visible (the static fixture never
    // advances the watermark past the last windows)
    val got = StreamOps.runToMemory(
      StreamOps.abTestStream(stream()), "ab_monitor", OutputMode.Complete)
      .collect().map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // batch replay of the same windowed Welch z over the static frame
    val e = graft.pipeline.EventsOps.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(unix_micros(col("ts")).as("us"),
        pmod(col("user_id"), lit(2L)).as("arm"),
        round(col("value") * 1000).cast("long").as("mv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byW = e.groupBy(t => t._1 / 3600000000L * 3600000000L)
    assert(got.keySet.map(_.getTime * 1000L) == byW.keySet)
    byW.foreach { case (wus, rows) =>
      def mom(arm: Long) = {
        val vs = rows.filter(_._2 == arm).map(_._3)
        (vs.length.toLong, vs.sum, vs.map(v => v * v).sum)
      }
      val (na, sa, qa) = mom(0); val (nb, sb, qb) = mom(1)
      val z = if (na == 0 || nb == 0) 0L else {
        val mA = sa.toDouble / na; val mB = sb.toDouble / nb
        val se2 = (qa.toDouble / na - mA * mA) / na +
          (qb.toDouble / nb - mB * mB) / nb
        if (se2 <= 0) 0L else math.round((mA - mB) / math.sqrt(se2) * 1e6)
      }
      val g = got.find(_._1.getTime * 1000L == wus).get._2
      assert(g == ((na, sa, nb, sb, z)), s"window $wus")
    }
    assert(got.nonEmpty)
  }
}
