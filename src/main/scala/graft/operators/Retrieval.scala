package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-stage hybrid retrieval SERVED FROM THE STREAMING INDEXES — the
  * shape the reference's recommend pipeline runs: lexical candidates
  * from the tag/author bag-of-words documents
  * (guessLike_u_first_select.py:50-63 builds them; :90 queries a
  * SparseMatrixSimilarity over the same term space) merged with the
  * vector-similarity side before ranking — re-expressed as one
  * declarative plan over the two streaming index families instead of
  * in-memory gensim matrices rebuilt per deploy.
  *
  * The batch math is gated by `r1_rrf_fusion` (DuckDB hash-match); this
  * operator is the SERVING twin: the lexical leg reads the tiered
  * postings index ([[graft.jobs.LexIngestJob.query]] — pushed term
  * pruning, generation-list pointer), the dense leg reads the IVF index
  * ([[Ann.queryIvfIndex]] — cell-pruned probes, generation-checked),
  * and both stay live under their ingest loops' folds/compactions.
  * HybridRetrievalSpec pins this plan's results against the
  * from-first-principles fusion of exact BM25 + brute-force cosine.
  *
  * Ranking discipline (must match the r1 gate bit-for-bit): the lexical
  * list orders by (score desc, id), the dense list by (round(cosine, 6)
  * desc, id) — [[Ann]]'s native rank — and each contributes
  * 1/(kRrf + rank); ties in the fused score resolve by id. The
  * top-k-then-rank windows run over ALREADY-LIMITED frames (k rows), so
  * the single-partition window is k-bounded, never corpus-bounded. */
object Retrieval {

  /** One query (a term bag + an embedding) against both indexes.
    * Output: (doc_id, rrf) — fused candidates, strongest first is
    * `orderBy(desc("rrf"), col("doc_id"))`. `k` bounds EACH leg's
    * candidate list; `nProbe` is the IVF probe width (its recall knob —
    * pass the cell count for exact dense ranks). */
  def hybridRrf(spark: SparkSession, lexDir: String, ivfDir: String,
                terms: Seq[String], queryVec: Array[Float], k: Int = 50,
                nProbe: Int = 4, kRrf: Int = 60): DataFrame = {
    val lexRank = Window.orderBy(desc("score"), col("id"))
    val lex = graft.jobs.LexIngestJob.query(spark, lexDir, terms)
      .orderBy(desc("score"), col("id")).limit(k)
      .withColumn("r", row_number().over(lexRank))
      .select(col("id").as("doc_id"), col("r"))
    import spark.implicits._
    val q = Seq((-1L, queryVec)).toDF("qid", "qv")
    val dense = Ann.queryIvfIndex(q, "qid", "qv", ivfDir, k, nProbe)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("r"))
    graft.rank.Fusion.rrf(Seq(lex, dense), "doc_id", "r", kRrf)
  }
}
