package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deliberate key-salting for skewed shuffles.
  *
  * Spark already covers the common cases — AQE splits skewed SortMergeJoin
  * partitions at runtime, and partial (map-side) aggregation absorbs hot keys
  * for algebraic aggregates — so these helpers are for the shapes AQE can't
  * re-plan: a broadcast-ineligible join straight into a hot key where the
  * skewed side must be pre-spread (stream-static joins, bucketed inputs AQE
  * won't re-shuffle), and holistic aggregates (collect_list-style) whose
  * state concentrates on one reducer.
  *
  * Correctness is salt-independent: the salt column only spreads rows of one
  * key over `salts` reducers; the small side is replicated `salts`× so every
  * (key, salt) pair still meets its match. Result multiset == the unsalted
  * join, for ANY salt assignment — which is why a nondeterministic per-row
  * salt is safe here (and exactly why it would NOT be safe to salt the
  * replicated side instead).
  */
object Skew {

  /** Join types for which replicating the small side is result-invariant:
    * an unmatched SMALL-side row must never survive, or it would appear once
    * per replica (right/full outer are therefore rejected). */
  private val SaltSafeJoins = // normalized: lowercase, underscores removed
    Set("inner", "left", "leftouter", "cross", "semi", "leftsemi",
      "anti", "leftanti")

  /** Deterministic per-row salt: a CONTENT hash of the full row. Stable
    * under task retry — a speculative or re-executed attempt assigns every
    * row the same salt as the attempt a reducer already consumed
    * (spark_partition_id/monotonically_increasing_id would not be: row
    * order within a recomputed shuffle partition is not guaranteed, the
    * SPARK-23207 class of bug). Byte-identical duplicate rows co-locate on
    * one salt — acceptable: they carry the same join matches anyway. */
  private def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)).cast("int")

  /** Public handle on the deterministic content salt, for callers composing
    * their own two-phase plans. Same retry-safety argument as [[saltedJoin]].
    *
    * LIMITATION: byte-identical duplicate rows always share one salt, so a
    * hot group made of duplicates (a duplicate-producing BGP under
    * GROUP_CONCAT, say) still concentrates on one (key, salt) reducer. For
    * joins that is fine — duplicates carry the same matches. For two-phase
    * AGGREGATION plans use [[spreadSalt]], which splits duplicates too. */
  def saltOf(df: DataFrame, salts: Int): Column = contentSalt(df, salts)

  /** Salt for two-phase AGGREGATION plans: the content hash mixed with
    * `spark_partition_id()`, so byte-identical duplicate rows spread across
    * input partitions land on different salts (within one input partition
    * they still share a salt — but a single input partition is already
    * bounded by `spark.sql.files.maxPartitionBytes` / the upstream shuffle,
    * which is the state bound the two-phase plan needs).
    *
    * Retry-safety differs from [[saltOf]], and rests on TWO facts — not on
    * scheduler rollback. (Catalyst's nondeterministic flag on
    * `spark_partition_id()` does NOT propagate to the RDD's
    * DeterministicLevel, so no INDETERMINATE-stage rollback protects this
    * column; an earlier revision claimed it did.) What actually holds:
    * (1) when the upstream is deterministic — a file scan or a sorted/
    * hash-partitioned shuffle output — a re-executed task recomputes the
    * SAME partition id with the SAME rows, so every attempt assigns every
    * row the same salt; (2) the salted-aggregate merge is
    * salt-assignment-invariant, so even a hypothetically different
    * assignment yields the same final result once each row is counted
    * exactly once. Consequence: do NOT use spreadSalt directly above an
    * operator with indeterminate output order/placement (round-robin
    * `repartition(n)`, shuffles of nondeterministically-tagged rows) — rows
    * could migrate between partitions across attempts and be double-counted
    * or lost under partial-stage retry, with no rollback backstop. Salt
    * above the deterministic source instead. Also NOT for [[saltedJoin]]'s
    * big side: the replicated small side must meet every salt value, which
    * only content-based salting guarantees per-row across attempts. */
  def spreadSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64((df.columns.map(col) :+ spark_partition_id().cast("long"))
      .toIndexedSeq: _*), lit(salts.toLong)).cast("int")

  /** Equi-join `big ⋈ small` on `key`, with the big side spread over
    * `salts` sub-keys and the small side replicated to match. Use when the
    * big side's key histogram is so peaked that one reducer would own the
    * key (and broadcast/AQE are unavailable). Cost: |small| × salts rows
    * shuffled on the replicated side — keep `salts` ≈ executor-core count. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String): DataFrame =
    saltedJoin(big, small, Seq(key), salts, joinType)

  def saltedJoin(big: DataFrame, small: DataFrame, key: String): DataFrame =
    saltedJoin(big, small, Seq(key), 32, "inner")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = saltedJoin(big, small, Seq(key), salts, "inner")

  /** Multi-key form of [[saltedJoin]] (compound equi-join keys, e.g. an LSH
    * band join's (band, bucket) pair). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 32, joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    require(SaltSafeJoins.contains(joinType.toLowerCase.replace("_", "")),
      s"joinType '$joinType' preserves unmatched small-side rows, which a " +
      "replicated small side would duplicate; use inner/left/semi/anti")
    val saltCol = "__graft_salt"
    val b = big.withColumn(saltCol, contentSalt(big, salts))
    val s = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Two-phase holistic aggregation: collect values per (key, salt) locally,
    * then merge the per-salt partials per key — bounds any single reducer's
    * state to ~1/salts of the hottest key. For algebraic aggregates
    * (sum/count/min/max/avg) Spark's partial aggregation already does this;
    * use this for collect_list/collect_set shapes. Output: (key, values). */
  def saltedCollect(df: DataFrame, key: String, value: String,
      salts: Int = 32): DataFrame = {
    val saltCol = "__graft_salt"
    df.withColumn(saltCol, contentSalt(df, salts))
      .groupBy(col(key), col(saltCol))
      .agg(collect_list(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("__partial"))).as("values"))
  }
}
