package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spreading for CPU-heavy per-row maps.
  *
  * The pipeline's expensive work is per-ROW compute (n-gram hashing,
  * shingling, md5 feature buckets, regex redaction, codec decodes), not
  * bytes: a corpus whose parquet fits in one file split scans as ONE task,
  * so the whole map runs on one core no matter how many the session has.
  * [[spread]] repartitions such an input round-robin across the session's
  * default parallelism — but ONLY in the small-input regime, judged from the
  * relation's size estimate against the session's split size: an input big
  * enough to scan with >= parallelism/2 splits (any production-scale table —
  * at 100 TB a scan has thousands of splits) passes through untouched, so
  * the extra exchange exists exactly where its cost (shuffling a few MB) is
  * trivial and its benefit (cores × speedup on the map) is largest.
  *
  * Round-robin keeps the exchange key-free: results everywhere downstream
  * are partitioning-insensitive by design (order-free integer aggregation
  * schemes, windows carrying their own keys), and plan pins that assert a
  * 100 TB shape ("no doc-keyed exchange") keep holding — they pin the
  * absence of hash/range exchanges, which this never introduces.
  */
object Par {
  /** Absolute ceiling on what the spread exchange may move: past a few GB
    * the input scans wide enough on its own, and the size-vs-split
    * arithmetic alone would let a multi-hundred-GB relation through at high
    * parallelism (e.g. 128 MB splits x 4000 cores / 2 = 256 GB) — the gate's
    * "only ever shuffles a few MB" premise must hold by construction, not by
    * luck. */
  private val SpreadMaxBytes = BigInt(4L << 30)

  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val split = spark.sessionState.conf.filesMaxPartitionBytes
    val sz = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (par > 1 && sz < SpreadMaxBytes &&
      sz < BigInt(split) * (par / 2).max(1)) df.repartition(par)
    else df
  }
}
