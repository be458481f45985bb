package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sliding-window document chunking — the retrieval/embedding prep step
  * (RAG indexing, long-document embedding, context-window packing feeds)
  * that [[Dedup.chunkDedup]]'s disjoint windows and [[Dedup.cdcChunks]]'
  * content-defined boundaries don't cover: consecutive chunks OVERLAP by
  * `windowTokens - strideTokens` tokens so no semantic span is ever cut
  * without a copy that contains it whole.
  *
  * Reference behavior: the reference pipeline embeds whole documents
  * (gensim doc2vec over full texts, calculate_similar.py); chunking is
  * part of the §8 training-data surface the brief adds.
  */
object Chunker {

  /** Chunks of `windowTokens` whitespace tokens advancing by
    * `strideTokens` (< window ⇒ overlap, = window ⇒ d8's disjoint grid).
    * Chunk count per doc is ceil((len - window) / stride) + 1 clamped to
    * >= 1 — windows are emitted until one covers the document tail, the
    * last one possibly short; a doc shorter than one window yields
    * exactly itself. Output: (idCol, chunk_idx 0-based, n_tokens,
    * chunk_text).
    *
    * Scale shape: pure projection + generator explode — ZERO shuffle;
    * fan-out is len/stride rows per doc, each carrying only its own
    * window's text (never the full document). Downstream embedding /
    * indexing repartitions as it needs. */
  def slidingTokenChunks(docs: DataFrame, idCol: String, textCol: String,
                         windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1 (got $windowTokens)")
    require(strideTokens >= 1 && strideTokens <= windowTokens,
      s"strideTokens must be in [1, windowTokens] (got $strideTokens)")
    val toks = TextFunctions.tokenize(col(textCol))
    val nChunks = greatest(
      (ceil((size(toks) - windowTokens).cast("double") / strideTokens) + 1)
        .cast("int"),
      lit(1))
    docs
      .select(col(idCol),
        posexplode(transform(sequence(lit(1), nChunks),
          i => slice(toks, (i - 1) * strideTokens + 1, lit(windowTokens)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }
}
