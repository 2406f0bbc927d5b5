package graft.store

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.IriScheme

/** Persistent store layout (the Spark analogue of the reference's durable
  * stores — SQLite `Sources/Kineo/QuadStore/SQLiteQuadStore.swift`, LMDB
  * Diomede): a directory of parquet tables plus a small JSON manifest.
  *
  * {{{
  *   <dir>/quads/    parquet (s,p,o,g,onum,odec), repartitioned by s and
  *                   sorted (s,p) within partitions → subject-locality scans
  *   <dir>/terms/    parquet dictionary, repartitioned+sorted by id
  *   <dir>/meta.json default graphs, per-predicate statistics, flags
  * }}}
  *
  * Statistics persist with the data, so `open` needs no ANALYZE pass — the
  * cluster-scale contract: encode once, reopen cheaply everywhere.
  */
object StorePersist {

  /** Catalog table name for a store directory (bucket metadata lives in the
    * session catalog; the data files live under `dir`). */
  def quadsTable(dir: String): String =
    "graft_quads_" + Integer.toHexString(dir.hashCode).replace('-', 'n')

  def save(store: RdfStore, dir: String, buckets: Int = 32): Unit = {
    val spark = store.spark
    val tbl = quadsTable(dir)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // subject-bucketed layout: repartition by the SAME hash the bucketing
    // uses so each bucket is exactly one file — scans then report both
    // HashPartitioning(s, n) AND per-bucket (s,p) sortedness, and
    // same-subject joins (BGP stars) run shuffle-free and sort-free
    store.quads
      .repartition(buckets, col("s"))
      .write.bucketBy(buckets, "s").sortBy("s", "p")
      .option("path", s"$dir/quads")
      .mode(SaveMode.Overwrite).saveAsTable(tbl)
    store.terms
      .repartition(col("id")).sortWithinPartitions("id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/terms")
    val profiles = store.predProfiles.map { case (p, pr) =>
      s"""{"p":$p,"allInline":${pr.allInline},"allNumeric":${pr.allNumeric},""" +
        s""""count":${pr.count},"oTags":[${pr.oTags.mkString(",")}],""" +
        s""""decExact":${pr.decExact}}"""
    }.mkString("[", ",", "]")
    val named = store.namedGraphs
      .map(ns => ns.mkString("[", ",", "]")).getOrElse("null")
    val meta =
      s"""{"defaultGraphs":${store.defaultGraphs.mkString("[", ",", "]")},
         |"spgAllInline":${store.spgAllInline},
         |"namedGraphs":$named,
         |"buckets":$buckets,
         |"profiles":$profiles}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "meta.json"), meta)
  }

  def open(spark: SparkSession, dir: String,
      scheme: IriScheme = IriScheme.default): RdfStore = {
    val meta = ujsonLite(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json")))
    // bucketed layouts re-register the bucket spec in this session's catalog
    // (the files carry it implicitly; the DDL tells Spark to trust it), so a
    // fresh session reopens with shuffle-free same-subject joins intact
    val quads0 = if (meta.buckets > 0) {
      val tbl = quadsTable(dir)
      if (!spark.catalog.tableExists(tbl))
        spark.sql(
          s"""CREATE TABLE $tbl (s BIGINT, p BIGINT, o BIGINT, g BIGINT,
             |onum DOUBLE, odec DECIMAL(38,18)) USING parquet
             |CLUSTERED BY (s) SORTED BY (s, p) INTO ${meta.buckets} BUCKETS
             |LOCATION '$dir/quads'""".stripMargin)
      spark.table(tbl)
    } else spark.read.parquet(s"$dir/quads")
    val quads = quads0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val terms = spark.read.parquet(s"$dir/terms")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RdfStore(quads, terms, scheme,
      defaultGraphs = meta.defaultGraphs,
      predProfiles = meta.profiles,
      spgAllInline = meta.spg,
      namedGraphs = meta.namedGraphs,
      bucketedS = meta.buckets > 0)
  }

  // minimal hand-rolled JSON decode for the manifest (no extra dependencies)
  private final case class Meta(defaultGraphs: Seq[Long], spg: Boolean,
      namedGraphs: Option[Seq[Long]], profiles: Map[Long, PredProfile],
      buckets: Int = 0)

  private def ujsonLite(s: String): Meta = {
    def arr(name: String): Seq[Long] = {
      val m = (name + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(s)
      m.map(_.group(1).split(',').filter(_.trim.nonEmpty).map(_.trim.toLong).toSeq)
        .getOrElse(Seq.empty)
    }
    val named =
      if (s.contains("\"namedGraphs\":null")) None else Some(arr("namedGraphs"))
    val buckets = "\"buckets\":(\\d+)".r.findFirstMatchIn(s)
      .map(_.group(1).toInt).getOrElse(0)
    val profRe =
      ("""\{"p":(-?\d+),"allInline":(true|false),"allNumeric":(true|false),""" +
        """"count":(\d+),"oTags":\[([^\]]*)\](?:,"decExact":(true|false))?\}""").r
    val profiles = profRe.findAllMatchIn(s).map { m =>
      m.group(1).toLong -> PredProfile(m.group(2).toBoolean, m.group(3).toBoolean,
        m.group(4).toLong,
        m.group(5).split(',').filter(_.trim.nonEmpty).map(_.trim.toInt).toSet,
        decExact = Option(m.group(6)).exists(_.toBoolean))
    }.toMap
    Meta(arr("defaultGraphs"), s.contains("\"spgAllInline\":true"), named, profiles,
      buckets)
  }
}
