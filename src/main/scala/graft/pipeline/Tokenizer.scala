package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-training primitives. [[bpeMerges]] is the merge-learning step of
  * byte-pair encoding (Sennrich et al. 2016, the standard subword-vocabulary
  * construction of LLM pretraining): repeatedly count adjacent symbol pairs
  * over the word-frequency table and merge the most frequent pair.
  *
  * Scale shape — how industrial distributed BPE trainers work, and why this
  * is safe at 100 TB: the corpus is touched ONCE (the word-count groupBy,
  * map-side combined, shuffling |vocab| rows), and the |vocab|-sized
  * word-frequency table — a few million rows for any real corpus, because
  * vocabulary grows ~O(corpus^0.5) (Heaps' law) — is collected to the driver
  * ONCE; every merge round after that is a local loop over that table
  * (Sennrich's own trainer operates on exactly this dict), so 32k merges
  * cost zero further Spark jobs. Driver traffic is one |vocab| collect
  * total, not one job per merge.
  *
  * Determinism: pair counts are exact integer sums; the merged pair is the
  * (count DESC, left ASC, right ASC) argmax, so ties break identically in
  * any engine. Merge application is greedy left-to-right NON-OVERLAPPING on
  * the symbol sequence — standard (Sennrich) BPE semantics: in a run
  * `a a a a` the first merge produces `aa aa`, not `aa a a`. The DuckDB
  * oracle reproduces this with a space-doubling `replace` (a single-space
  * pattern under-merges runs because adjacent matches share a boundary
  * space; doubling gives every match its own boundary — pinned on even- and
  * odd-run corpora in PipelineSpec).
  */
object Tokenizer {

  /** Code-point symbolization (matches `substring(w, i, 1)` in Spark and
    * `substr` in DuckDB, both code-point-indexed — `String.split("")` would
    * break surrogate pairs into lone UTF-16 units). */
  private def codePoints(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** UTF-8 byte order — the string order BOTH engines sort by (Spark's
    * UTF8String comparison and DuckDB's default collation are binary UTF-8),
    * which differs from Java's UTF-16 `compareTo` for non-BMP code points. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Greedy left-to-right non-overlapping application of one merge to a
    * symbol sequence — the Sennrich apply step. */
  private def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Learn `nMerges` BPE merges from the corpus' whitespace words.
    * Output: (rank, lhs, rhs, freq) — the merge table, rank ascending.
    * One Spark job (the word-frequency collect); the merge loop is local. */
  def bpeMerges(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame =
    bpeMergesOf(TextStats.docs(spark, dir), nMerges)

  /** [[bpeMerges]] over an explicit (text, …) frame — e.g. a train split. */
  def bpeMergesOf(d: DataFrame, nMerges: Int = 8): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    // the ONLY corpus pass: word counts, map-side combined
    val vocab: Array[(Array[String], Long)] = d
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .collect()
      .map(r => (codePoints(r.getString(0)), r.getLong(1)))
    val words = vocab.map(_._1)
    val freqs = vocab.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (rank <- 1 to nMerges) {
      // count every adjacent pair occurrence (overlapping positions count,
      // as in Sennrich's get_stats: [a,a,a] contributes (a,a) twice)
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val ss = words(wi); val f = freqs(wi); var i = 0
        while (i + 1 < ss.length) {
          val k = (ss(i), ss(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
        wi += 1
      }
      if (counts.nonEmpty) {
        // (count DESC, l ASC, r ASC) argmax under UTF-8 byte order
        val ((l, r), f) = counts.reduceLeft { (a, b) =>
          val cmp = java.lang.Long.compare(b._2, a._2)
          val better =
            if (cmp != 0) cmp < 0
            else if (a._1._1 != b._1._1) utf8Lt(a._1._1, b._1._1)
            else utf8Lt(a._1._2, b._1._2)
          if (better) a else b
        }
        merges += ((rank.toLong, l, r, f))
        wi = 0
        while (wi < words.length) {
          if (words(wi).length >= 2) words(wi) = applyMerge(words(wi), l, r)
          wi += 1
        }
      }
    }
    merges.toSeq.toDF("rank", "lhs", "rhs", "freq")
  }

  /** One greedy merge layer as a Column: double every boundary space so
    * adjacent matches stop sharing one (" a a a a " single-space-replaces to
    * " aa a a "; doubled, every pair matches → " aa aa "), replace, collapse
    * back. Exactly mirrored in the DuckDB oracle CTEs. */
  private[pipeline] def mergeLayer(c: Column, l: String, r: String): Column =
    replace(
      replace(replace(c, lit(" "), lit("  ")), lit(s" $l  $r "), lit(s" $l$r ")),
      lit("  "), lit(" "))

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
      merges: Seq[(String, String)]): DataFrame =
    bpeSegmentCountsOf(TextStats.docs(spark, dir), merges)

  /** [[bpeSegmentCounts]] over an explicit (doc_id, text, …) frame. `carry`
    * columns (computed off the input row, e.g. a split label) ride along
    * map-side so callers never need a join-back. */
  def bpeSegmentCountsOf(d: DataFrame, merges: Seq[(String, String)],
      carry: Seq[(String, Column)] = Nil): DataFrame = {
    val sym0 = concat(lit(" "), concat_ws(" ", expr(
      "flatten(transform(split(text, ' '), w -> " +
      "concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)), array('|'))))")),
      lit(" ")).as("sym")
    val merged = merges.foldLeft(col("sym")) { case (c, (l, r)) =>
      mergeLayer(c, l, r)
    }
    val carryNames = carry.map { case (n, _) => col(n) }
    d.select(col("doc_id") +: carry.map { case (n, c) => c.as(n) } :+
        length(col("text")).cast("long").as("n_chars") :+ sym0: _*)
      .select(col("doc_id") +: carryNames :+ col("n_chars") :+ merged.as("m"): _*)
      // subwords = symbols minus the per-word '|' sentinels
      .select(col("doc_id") +: carryNames :+ col("n_chars") :+
        (size(split(trim(col("m")), " ")) -
          size(filter(split(trim(col("m")), " "), s => s === "|"))).cast("long")
          .as("n_subwords"): _*)
  }
}
