package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Hard-negative mining for contrastive/embedding training: for each query
  * vector, the most-similar corpus items with a DIFFERENT label (the
  * negatives a random sampler would almost never surface), plus each
  * negative's margin to the query's hardest positive — the quantity
  * triplet/InfoNCE losses train against, and the filter for "semi-hard"
  * selection (margin in (0, m)) vs "violating" (margin < 0).
  *
  * Plan shape: one scored pair frame (broadcast queries against the corpus
  * scan — [[graft.operators.Ann.bruteForceTopK]]'s shape), then ONE
  * shuffle keyed on query_id evaluates both windows (the unordered
  * hardest-positive max and the ordered negative rank share the
  * partitioning). At corpus scale swap the exact pair scoring for an ANN
  * prefilter ([[graft.operators.Ann.lshTopK]] with k overfetched by the
  * expected positive rate) and feed its candidates through the same
  * windows — the margin/rank semantics are unchanged.
  */
object HardNegatives {

  /** Mine the top-`k` hardest negatives per query.
    *
    * Both inputs need (idCol, vecCol, labelCol); queries are excluded from
    * their own neighbor lists by id. Output: (query_id, neighbor_id,
    * cosine, rank, margin) where rank orders negatives by similarity
    * (ties: rounded cosine, then id) and margin = hardest_pos − cosine
    * (NULL when the query has no positive in the corpus — margin-based
    * filters then degrade gracefully). */
  def mine(queries: DataFrame, corpus: DataFrame, idCol: String,
           vecCol: String, labelCol: String, k: Int,
           broadcastQueries: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("__ql"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("__nl"))
    val pairs =
      (if (broadcastQueries) c.crossJoin(broadcast(q)) else c.crossJoin(q))
        .where(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          (col("__ql") === col("__nl")).as("__is_pos"),
          cosine(col("qv"), col("cv")).as("cosine"))
    val wAll = Window.partitionBy("query_id")
    val wRank = Window.partitionBy("query_id")
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id").asc)
    pairs
      .withColumn("__hp", max(when(col("__is_pos"), col("cosine"))).over(wAll))
      .where(!col("__is_pos"))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank"), (col("__hp") - col("cosine")).as("margin"))
  }
}
