package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-training primitives. [[bpeMerges]] is the merge-learning step of
  * byte-pair encoding (Sennrich et al. 2016, the standard subword-vocabulary
  * construction of LLM pretraining): repeatedly count adjacent symbol pairs
  * over the word-frequency table and merge the most frequent pair.
  *
  * Scale shape — how industrial distributed BPE trainers work, and why this
  * is safe at 100 TB: the corpus is touched ONCE (the word-count groupBy,
  * map-side combined, shuffling |vocab| rows); every merge round after that
  * operates on the |vocab|-sized symbol table — explode adjacent pairs,
  * hash-groupBy, and a single argmax row to the driver (the same
  * centroid-sized closure-shipping shape as k-means). Driver traffic is ONE
  * row per merge; the corpus is never re-read.
  *
  * Determinism: pair counts are exact integer sums; the merged pair is the
  * (count DESC, left ASC, right ASC) argmax, so ties break identically in
  * any engine. Merge application uses non-overlapping left-to-right string
  * replacement over space-separated symbols — BPE's greedy semantics, and
  * the scan order `replace` contracts in both Spark and the DuckDB oracle
  * (pinned on an "aaa" corpus in PipelineSpec).
  */
object Tokenizer {

  /** Learn `nMerges` BPE merges from the corpus' whitespace words.
    * Output: (rank, lhs, rhs, freq) — the merge table, rank ascending. */
  def bpeMerges(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    import spark.implicits._
    val words = TextStats.docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // " c1 c2 … cn " — leading/trailing spaces make every adjacent pair
    // (incl. at word edges) match the same ' l r ' pattern
    var syms = ScratchCache.persist(words.select(
      concat(lit(" "), concat_ws(" ",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
        lit(" ")).as("sym"),
      col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (rank <- 1 to nMerges) {
      val top = syms
        .select(col("freq"), split(trim(col("sym")), " ").as("ss"))
        .select(col("freq"), explode(expr(
          "CASE WHEN size(ss) >= 2 THEN transform(sequence(0, size(ss) - 2), " +
          "i -> struct(element_at(ss, i+1) AS l, element_at(ss, i+2) AS r)) " +
          "ELSE array() END")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect() // the argmax row — the ONLY driver traffic per round
      if (top.nonEmpty) {
        val (l, r, f) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank.toLong, l, r, f))
        syms = ScratchCache.persist(syms.select(
          replace(col("sym"), lit(s" $l $r "), lit(s" $l$r ")).as("sym"),
          col("freq")))
      }
    }
    merges.toSeq.toDF("rank", "lhs", "rhs", "freq")
  }

  /** Apply a learned merge table to the corpus: per document, the subword
    * count after `merges` (the compression-diagnostic a tokenizer-training
    * pipeline tracks — tokens-per-doc before vs after). Map-side only: the
    * merge table ships in the plan as literals.
    *
    * Representation limits (both operators): symbols are space-separated, so
    * corpus tokens must not contain ' ' (guaranteed — words come from a
    * space split); the '|' word sentinel below additionally assumes '|' is
    * not a corpus character (true for natural-language corpora; a binary-ish
    * corpus would pick a non-occurring sentinel). */
  def bpeSegmentCounts(spark: SparkSession, dir: String,
      merges: Seq[(String, String)]): DataFrame = {
    val sym0 = concat(lit(" "), concat_ws(" ", expr(
      "flatten(transform(split(text, ' '), w -> " +
      "concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)), array('|'))))")),
      lit(" ")).as("sym")
    val merged = merges.foldLeft(col("sym")) { case (c, (l, r)) =>
      replace(c, lit(s" $l $r "), lit(s" $l$r "))
    }
    TextStats.docs(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"), sym0)
      .select(col("doc_id"), col("n_chars"), merged.as("m"))
      // subwords = symbols minus the per-word '|' sentinels
      .select(col("doc_id"), col("n_chars"),
        (size(split(trim(col("m")), " ")) -
          size(filter(split(trim(col("m")), " "), s => s === "|"))).cast("long")
          .as("n_subwords"))
  }
}
