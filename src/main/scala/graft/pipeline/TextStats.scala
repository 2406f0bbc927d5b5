package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators: token counting, quality scoring, language-ID heuristic,
  * document fingerprinting. All are single-pass columnar transforms (no shuffle
  * except where grouped) — at 100 TB these run map-side over the document scan.
  */
object TextStats {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Whitespace tokenization + a BPE-ish subword proxy (4-char pieces). */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("len"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      // BPE-ish proxy: ceil(word-length / 4) pieces per word
      expr("aggregate(transform(split(text, ' '), w -> CAST(ceil(length(w) / 4.0) AS LONG))," +
        " 0L, (acc, x) -> acc + x)").as("n_subwords"),
      round(expr("aggregate(transform(split(text, ' '), w -> length(w)), 0L, " +
        "(acc, x) -> acc + x)") / size(split(col("text"), " ")), 4).as("avg_tok_len"))

  private val stopwords = Seq("the", "a", "of", "to", "and", "in", "is")

  /** Quality heuristics: stopword ratio, type/token ratio, digit & punct density. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    docs(spark, dir).select(
      col("doc_id"),
      round(expr(s"size(filter(split(text, ' '), w -> w IN ($stopList)))") /
        size(split(col("text"), " ")), 4).as("stop_ratio"),
      round(size(array_distinct(split(col("text"), " "))) /
        size(split(col("text"), " ")), 4).as("type_token"),
      round((length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", ""))) / length(col("text")), 4)
        .as("digit_ratio"),
      round((length(col("text")) -
        length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))) / length(col("text")), 4)
        .as("punct_ratio"))
  }

  /** Language-ID heuristic: score languages by marker-word hits, deterministic
    * priority on ties. (The synthetic corpus is English-vocabulary; the *mechanism*
    * — per-language marker scoring — is what matters.)
    */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    def hits(words: Seq[String]) =
      expr(s"size(filter(split(text, ' '), w -> w IN (${words.map(w => s"'$w'").mkString(", ")})))")
    val en = hits(Seq("the", "a", "of", "and", "is"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val fr = hits(Seq("le", "la", "les", "et", "est"))
    docs(spark, dir).select(
      col("doc_id"),
      when(en >= de && en >= fr && en > 0, "en")
        .when(de >= fr && de > 0, "de")
        .when(fr > 0, "fr")
        .otherwise("unknown").as("pred_lang"))
  }

  private val FP_BASE = 1000003L
  private val FP_MOD = 2305843009213693951L // 2^61 - 1

  /** Rolling polynomial fingerprint of the lowercased text (deterministic). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val fp = udf { (s: String) =>
      var h = 0L
      var i = 0
      val t = s.toLowerCase
      while (i < t.length) {
        // mulmod in 128-bit via Math.multiplyHigh-free approach: use BigInt-free
        // split multiply (h < 2^61, base < 2^20 → h*base < 2^81: do it in two parts)
        val hi = h >>> 31
        val lo = h & 0x7FFFFFFFL
        val m = (((hi * FP_BASE) % FP_MOD) * (1L << 31)) % FP_MOD
        h = (m + lo * FP_BASE + t.charAt(i).toLong) % FP_MOD
        i += 1
      }
      h
    }
    docs(spark, dir).select(col("doc_id"), fp(col("text")).as("fingerprint"))
  }
}
