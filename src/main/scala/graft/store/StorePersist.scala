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

  def save(store: RdfStore, dir: String): Unit = {
    store.quads
      .repartition(col("s")).sortWithinPartitions("s", "p")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/quads")
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
         |"profiles":$profiles}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "meta.json"), meta)
  }

  def open(spark: SparkSession, dir: String,
      scheme: IriScheme = IriScheme.default): RdfStore = {
    val meta = ujsonLite(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json")))
    val quads = spark.read.parquet(s"$dir/quads")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val terms = spark.read.parquet(s"$dir/terms")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RdfStore(quads, terms, scheme,
      defaultGraphs = meta.defaultGraphs,
      predProfiles = meta.profiles,
      spgAllInline = meta.spg,
      namedGraphs = meta.namedGraphs)
  }

  // minimal hand-rolled JSON decode for the manifest (no extra dependencies)
  private final case class Meta(defaultGraphs: Seq[Long], spg: Boolean,
      namedGraphs: Option[Seq[Long]], profiles: Map[Long, PredProfile])

  private def ujsonLite(s: String): Meta = {
    def arr(name: String): Seq[Long] = {
      val m = (name + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(s)
      m.map(_.group(1).split(',').filter(_.trim.nonEmpty).map(_.trim.toLong).toSeq)
        .getOrElse(Seq.empty)
    }
    val named =
      if (s.contains("\"namedGraphs\":null")) None else Some(arr("namedGraphs"))
    val profRe =
      ("""\{"p":(-?\d+),"allInline":(true|false),"allNumeric":(true|false),""" +
        """"count":(\d+),"oTags":\[([^\]]*)\](?:,"decExact":(true|false))?\}""").r
    val profiles = profRe.findAllMatchIn(s).map { m =>
      m.group(1).toLong -> PredProfile(m.group(2).toBoolean, m.group(3).toBoolean,
        m.group(4).toLong,
        m.group(5).split(',').filter(_.trim.nonEmpty).map(_.trim.toInt).toSet,
        decExact = Option(m.group(6)).exists(_.toBoolean))
    }.toMap
    Meta(arr("defaultGraphs"), s.contains("\"spgAllInline\":true"), named, profiles)
  }
}
