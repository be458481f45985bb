package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.io.{KVSink, KVWriter}
import graft.operators.SimilarityJoin
import graft.prep.{Documents, TagWeighting}
import graft.rank.TitleDedup

/** Entry point 3.1 — offline similar-books batch (SURVEY §3.1).
  *
  * Reference (simility_books.py main): book/tag joins → weighted tag docs →
  * BoW vectors → all-pairs cosine top-100 → title dedup → rating re-rank →
  * capped list to Redis `b_similar:{bookId}`. The reference uses two caps
  * at different sites (15 in-memory, 20 written — simility_books.py:92-93);
  * `store` is that cap, so callers pick the site they are reproducing.
  *
  * One declarative DataFrame job: every stage is a transformation, the only
  * actions are the final KV write. Scale: the similarity join is the
  * inverted-index form (§7.4); everything else is broadcast joins + window
  * top-k.
  */
object SimilarBooksJob {

  final case class Result(pairs: DataFrame, ranked: DataFrame)

  /** Returns (bookId → similar list) and writes `b_similar:{id}` to `kv`.
    *
    * `maxDfFraction` defaults ON (0.5): terms in more than half the corpus
    * carry no discriminative signal and are the one input that would turn
    * the term self-join quadratic at scale — the same role the reference's
    * stop-word list plays (guessLike_u_like.py:72-75). Set both df knobs
    * to 0 for the exact-cosine oracle shape. */
  def run(book: DataFrame, tag: DataFrame, bookTag: DataFrame,
          kv: KVSink, topK: Int = 100, store: Int = 15,
          maxDf: Long = 0L, maxDfFraction: Double = 0.5): Result = {
    val tagDocs = TagWeighting.weightedTagDocs(bookTag, tag)
    val docs = Documents.bookDocs(book, tagDocs)
    val tokenized = docs.select(col("bookId"),
      TextFunctions.tokenize(col("doc")).as("toks"))
    val pairs = SimilarityJoin.exactCosineTopK(
      tokenized, "bookId", "toks", k = topK, maxDf = maxDf,
      maxDfFraction = maxDfFraction)
    val ranked = TitleDedup.dedupAndRerank(
      pairs, docs.select(col("bookId"), col("title"), col("rating")), store)
    val lists = ranked
      .groupBy(col("a"))
      .agg(collect_list(struct(col("pos"), col("b"))).as("pb"))
      .select(
        TextFunctions.kvKey("b_similar", col("a")).as("key"),
        TextFunctions.joinIds(
          transform(sort_array(col("pb")), x => x.getField("b"))).as("value"))
    KVWriter.write(lists, kv)
    Result(pairs, ranked)
  }
}
