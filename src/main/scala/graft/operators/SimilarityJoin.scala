package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All-pairs cosine similarity join with per-key top-k (SURVEY §2.3 J7/J8).
  *
  * The reference computes every book's bag-of-words cosine similarity against
  * the whole corpus with gensim, truncating to the 100 best
  * (simility_books.py:60-63,66,72-79), and a query-vector-vs-cluster variant
  * (guessLike_u_like.py:90,113-117). Both are materialized-index designs that
  * cannot scale past one node.
  *
  * Spark-first design — a *join*, not an index:
  *   1. explode documents into (id, term, tf) postings,
  *   2. self-join postings on `term` (the sparse inverted-index trick: only
  *      document pairs that share at least one term are ever materialized —
  *      at 100 TB this is the difference between O(n²) and O(sum of squared
  *      posting-list lengths)),
  *   3. partial-aggregated `sum(tfA * tfB)` per pair (map-side combine
  *      shrinks the shuffle), divide by precomputed L2 norms,
  *   4. per-key top-k via `row_number` (Spark >= 3.5 plans WindowGroupLimit).
  *
  * High-document-frequency terms dominate the join cost (a term in d docs
  * yields d² candidate pairs); `maxDf` prunes them, exactly the role the
  * reference's stop-word list plays (guessLike_u_like.py:72-75). For 100 TB,
  * the complementary path is MinHash-LSH banding ([[Dedup.minHashLsh]]),
  * which replaces the term join with a bounded-fanout bucket join.
  */
object SimilarityJoin {

  /** Postings (id, term, tf, norm) from (id, tokens array). */
  def postings(docs: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(col(tokensCol)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val norms = tf.groupBy("id")
      .agg(sqrt(sum(col("tf") * col("tf"))).as("norm"))
    tf.join(norms, "id")
  }

  /** Exact cosine top-k pairs: (a, b, sim), top `k` per `a`, both directions,
    * self-pairs excluded. `minSim` drops below-threshold pairs before the
    * window (cheap pre-filter).
    *
    * Hot-term pruning — the one knob that keeps this join non-quadratic at
    * scale (a term in d documents yields d² candidate pairs):
    *   - `maxDf` drops terms appearing in more than that many documents
    *     from pair *generation* (absolute cap; <= 0 disables),
    *   - `maxDfFraction` drops terms appearing in more than that fraction
    *     of the corpus (corpus-relative cap that needs no retuning as data
    *     grows; <= 0 disables). Both set → the tighter cap wins.
    * Pruning semantics: norms are still computed over the FULL vocabulary,
    * so similarities involving pruned terms are underestimates — identical
    * to the reference dropping stop-words from the dot product
    * (guessLike_u_like.py:72-75). Leave both knobs off for exact cosine
    * (the oracle path). */
  def exactCosineTopK(docs: DataFrame, idCol: String, tokensCol: String,
                      k: Int, minSim: Double = 0.0, maxDf: Long = 0L,
                      maxDfFraction: Double = 0.0,
                      queryPred: Option[Column] = None): DataFrame = {
    val post = postings(docs, idCol, tokensCol)
    val joinSide =
      if (maxDf > 0 || maxDfFraction > 0) {
        // df per term from the postings (one row per (id, term) already);
        // the corpus-relative cap joins the single-row total in via a
        // broadcast cross join, keeping the whole prune declarative — no
        // driver-side count action
        val dfCounts = post.groupBy("term").agg(count(lit(1)).as("df"))
        val total = post.agg(countDistinct(col("id")).as("n"))
        val absCap = if (maxDf > 0) lit(maxDf) else lit(Long.MaxValue)
        val fracCap =
          if (maxDfFraction > 0) floor(col("n") * lit(maxDfFraction))
          else lit(Long.MaxValue)
        val keep = dfCounts.crossJoin(broadcast(total))
          .where(col("df") <= least(absCap, fracCap))
          .select("term")
        post.join(keep, "term")
      } else post
    // Restricting the query side (J8's query-vs-partition shape) bounds the
    // pair fanout to |queries| x df(term) instead of df(term)^2.
    val leftSide = queryPred.map(p => joinSide.where(p)).getOrElse(joinSide)
    val a = leftSide.select(col("id").as("a"), col("term"),
      col("tf").as("tfa"), col("norm").as("na"))
    val b = joinSide.select(col("id").as("b"), col("term"),
      col("tf").as("tfb"), col("norm").as("nb"))
    val sims = a.join(b, Seq("term"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg((sum(col("tfa") * col("tfb")) / (first("na") * first("nb"))).as("sim"))
      .where(col("sim") >= minSim)
    val w = Window.partitionBy("a").orderBy(round(col("sim"), 6).desc, col("b").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("a"), col("b"), col("sim"), col("rank"))
  }
}
