package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval primitives of a RAG / training-data stack: BM25 lexical top-k
  * over an inverted index, and hybrid fusion of lexical and dense rankings
  * by reciprocal-rank fusion (RRF).
  *
  * Determinism: each per-term BM25 contribution is one fixed chain of IEEE
  * ops over exact integers (tf, df, len, N, total-len) and is fixed-pointed
  * to integer micro-units BEFORE the per-document sum — the same
  * order-free-integer-accumulation device as [[TextStats.surprisal]]. RRF
  * scores are functions of small integer ranks only, summed in a fixed
  * two-term order. Ranking cuts break ties on the candidate id.
  *
  * Scale shape: BM25 is the textbook posting-list join — the query-term
  * frame (|q|·|terms per query|) equi-joins the tf index on the TERM key, so
  * cost follows posting-list occupancy, never |q|×|corpus|; df/len/N are the
  * same bounded aggregates the surprisal/tfidf operators use. Fusion joins
  * two top-N rank frames (tiny) full-outer on (query, candidate).
  */
object Retrieval {

  private val K1 = 1.2
  private val B = 0.75

  /** Above this input-size estimate the index build switches df from the
    * tok window to the skew-splittable join-back (see [[index]]). 8 GB of
    * documents is far past every local SF and far below any production
    * corpus — the same scale-gating device as [[Par.spread]]. Overridable
    * for tests/ops via system property `graft.bm25.df` or env
    * `SPARK_GRAFT_BM25_DF` = `window` | `join` (default: the size gate). */
  private val DfJoinThresholdBytes = BigInt(8L << 30)

  /** Corpus-side posting index, ONE persisted frame carrying everything a
    * scoring pass needs per posting: (doc_id, tok, len, tf, df), built from
    * one (doc, tok)-keyed tf aggregate (len rides along as a functionally-
    * dependent group key, so the old per-score doc-keyed `lens` join never
    * exists). Each BM25 scoring pass is a broadcast-query probe of this
    * cache + one small (qid, nid) aggregate — ZERO corpus-side shuffles per
    * pass, which is what makes the twice-scoring PRF shape affordable.
    *
    * df (= posting rows per tok, identical either way) has two shapes behind
    * a SIZE GATE:
    *  - small inputs: `count(*) over (partition by tok)` — the fastest local
    *    shape by a wide margin (single pass, no join). Measured best-of-four
    *    this round: ret subset 4.45 s vs 6.5-6.9 s for every join variant
    *    (per-pass df join re-paid a broadcast barrier per PRF re-score;
    *    a tf+join double persist paid a second cache-materialization
    *    barrier; single-persist join-back re-computed the tf aggregate —
    *    column pruning makes the df branch's partial aggregate differ, so
    *    exchange reuse can never fire).
    *  - big inputs: groupBy(tok) df aggregate (map-side combinable) joined
    *    back on tok. One more corpus aggregation, but nothing single-task:
    *    WindowExec buffers EVERY posting of a token in ONE task — a
    *    stop-word is a corpus-sized single-key straggler at 100 TB that AQE
    *    cannot split (skew handling applies only to joins), while the
    *    join-back's skewed tok partitions ARE AQE-splittable. The sf0.1
    *    battery cannot reward this shape (no skew exists there), so the
    *    gate keeps the local bench on the window while every
    *    production-sized input gets the skew-safe plan.
    * Both paths are pinned value-identical by a PipelineSpec test.
    * Returns (postings, totalLen, N). */
  private def index(spark: SparkSession, dir: String)
      : (DataFrame, Long, Long) = {
    val d = TextStats.docs(spark, dir)
    val lens = d.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("len"))
    val agg = lens.agg(sum("len").as("tot"), count(lit(1)).as("n")).first()
    val tf = d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("len"),
        explode(col("ws")).as("tok"))
      .groupBy("doc_id", "tok", "len").agg(count(lit(1)).as("tf"))
    val useJoin = sys.props.get("graft.bm25.df")
      .orElse(sys.env.get("SPARK_GRAFT_BM25_DF")) match {
      case Some("join") => true
      case Some("window") => false
      case _ =>
        d.queryExecution.optimizedPlan.stats.sizeInBytes > DfJoinThresholdBytes
    }
    val withDf =
      if (useJoin) tf.join(tf.groupBy("tok").agg(count(lit(1)).as("df")), "tok")
      else {
        val wTok = org.apache.spark.sql.expressions.Window.partitionBy("tok")
        tf.withColumn("df", count(lit(1)).over(wTok))
      }
    val postings = ScratchCache.persist(withDf)
    (postings, agg.getLong(0), agg.getLong(1))
  }

  /** BM25 scoring of a (qid, tok) query-term frame against the index:
    * one fixed op chain per (tf, df, len) triple, identical in the oracle:
    * idf = ln((N - df + 0.5) / (df + 0.5) + 1)
    * norm = (1 - b) + b * (len * N) / totalLen      [exact-integer inputs]
    * term = idf * tf * (k1 + 1) / (tf + k1 * norm)  -> round to micro-units
    * The query side is tiny by construction (a handful of query docs'
    * distinct tokens) and broadcast explicitly — the posting side is never
    * shuffled. Output (qid, nid, score_micro). */
  private def bm25Score(qterms: DataFrame, postings: DataFrame,
      tot: Long, n: Long): DataFrame = {
    val idf = log((lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = lit(1.0 - B) + lit(B) * (col("len") * lit(n.toDouble)) / lit(tot.toDouble)
    val term = idf * col("tf") * lit(K1 + 1.0) / (col("tf") + lit(K1) * norm)
    broadcast(qterms)
      .join(postings.withColumnRenamed("doc_id", "nid"), "tok")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), round(term * 1e6).cast("long").as("micro"))
      .groupBy("qid", "nid").agg(sum("micro").as("score_micro"))
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score_micro").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** BM25 top-k, query-by-example: each doc with doc_id < nQueries queries
    * the rest of the corpus with its own distinct tokens. Output
    * (qid, nid, score_micro, rk). */
  def bm25TopK(spark: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5): DataFrame = {
    val (postings, tot, n) = index(spark, dir)
    val qterms = postings.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), col("tok"))
    topK(bm25Score(qterms, postings, tot, n), k)
  }

  /** Pseudo-relevance-feedback query expansion (RM3/Rocchio-lite, fully
    * deterministic): run BM25, take each query's top-`fbDocs` results, rank
    * candidate expansion terms by their summed tf across those feedback docs
    * (an exact integer; ties on the token), add the top-`fbTerms` terms NOT
    * already in the query, and re-score. The classic recall lever of a
    * lexical retrieval stack. Output (qid, nid, score_micro, rk).
    *
    * Scale shape: two posting-list joins (the second with ≤ fbTerms more
    * terms per query) plus one feedback join bounded by |q|·fbDocs rows —
    * same cost family as bm25TopK, no new corpus-sized structure. */
  def bm25Prf(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 5,
      fbDocs: Int = 3, fbTerms: Int = 5): DataFrame = {
    val (postings, tot, n) = index(spark, dir)
    val q0 = postings.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), col("tok"))
      .transform(ScratchCache.persist)
    val fb = topK(bm25Score(q0, postings, tot, n), fbDocs)
      .select(col("qid"), col("nid"))
    val exW = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("wt").desc, col("tok"))
    // feedback docs are |q|·fbDocs rows — broadcast them into the posting
    // cache probe, same discipline as the scoring passes
    val ex = broadcast(fb).join(postings.withColumnRenamed("doc_id", "nid"), "nid")
      .join(q0, Seq("qid", "tok"), "left_anti")
      .groupBy("qid", "tok").agg(sum("tf").as("wt"))
      .withColumn("rk", row_number().over(exW)).filter(col("rk") <= fbTerms)
      .select(col("qid"), col("tok"))
    val q2 = q0.union(ex).distinct()
    topK(bm25Score(q2, postings, tot, n), k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical ranking
    * and the dense cosine ranking (embeddings row i ↔ documents row i in the
    * synthetic corpus). rrf(c) = Σ_lists 1/(60 + rank_list(c)), missing from
    * a list contributes 0; micro-rounded, top-k by (score, id). */
  def hybridRrf(spark: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5, poolK: Int = 20): DataFrame = {
    val lex = bm25TopK(spark, dir, nQueries, poolK)
      .select(col("qid"), col("nid"), col("rk").as("lex_rk"))
    val dense = Similarity.bruteTopK(spark, dir, nQueries, poolK)
      .select(col("qid"), col("nid"), col("rk").as("den_rk"))
    val fused = lex.join(dense, Seq("qid", "nid"), "full_outer")
      .select(col("qid"), col("nid"),
        (round(when(col("lex_rk").isNotNull, lit(1e6) / (lit(60.0) + col("lex_rk")))
            .otherwise(lit(0.0))) +
          round(when(col("den_rk").isNotNull, lit(1e6) / (lit(60.0) + col("den_rk")))
            .otherwise(lit(0.0)))).cast("long").as("rrf_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("rrf_micro").desc, col("nid"))
    fused.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
