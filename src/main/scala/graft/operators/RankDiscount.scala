package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-discounted vote aggregation (SURVEY §2.4 A9).
  *
  * The reference iterates a user's neighbors in similarity-descending order;
  * the k-th time a book appears, it contributes `score_k * 1/ln(k+1)`, and a
  * book's final score is the sum of its contributions
  * (guessLike_u_like.py:119-124, log_analyze.py:174-179).
  *
  * This is the only order-sensitive aggregate in the reference. Spark-first
  * form: make the order explicit with a window `row_number` (occurrence
  * index within each vote target, ordered by the neighbor order), then an
  * ordinary partial+final `sum` — no custom UDAF needed, everything stays in
  * whole-stage codegen. The neighbor order must be a *total* order
  * (similarity desc, then a deterministic tie-break) or results are
  * nondeterministic; the reference's tie-break is arbitrary argsort
  * stability, ours is explicit (§4.2 determinism policy).
  */
object RankDiscount {

  /** For rows (groupKeys..., voteKey, score) where `order` gives the
    * neighbor ordering within each group: computes per (groupKeys, voteKey)
    * the sum of `score / ln(occurrence + 1)` where occurrence is the 1-based
    * index of the row among the group's rows for that voteKey, in neighbor
    * order. */
  def discountedVotes(df: DataFrame, groupKeys: Seq[String], voteKey: String,
                      scoreCol: String, order: Seq[Column],
                      out: String = "vote_score"): DataFrame = {
    val occW = Window
      .partitionBy((groupKeys :+ voteKey).map(col): _*)
      .orderBy(order: _*)
    df.withColumn("__occ", row_number().over(occW))
      .groupBy((groupKeys :+ voteKey).map(col): _*)
      .agg(sum(col(scoreCol) / log(col("__occ") + lit(1))).as(out))
  }
}
