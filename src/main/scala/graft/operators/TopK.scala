package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key top-k and top-fraction selection (SURVEY §2.5 W1/W3/W5).
  *
  * The reference truncates similarity candidate lists to the top 100 per book
  * (simility_books.py:62-63, gensim `num_best=100`), takes the latest-3
  * collected books per user (guessLike_u_like.py:203), and keeps the top 10%
  * of a cluster's users by similarity with `int()` (floor) truncation of the
  * count (guessLike_u_like.py:114-115).
  *
  * Spark-first: `row_number` over a per-key window. Spark >= 3.5 rewrites
  * `rn <= k` filters over rank-like window functions into `WindowGroupLimit`,
  * which keeps a bounded per-key heap on the map side instead of fully
  * sorting each partition group — this is what makes per-key top-k viable at
  * 100 TB (no global sort, bounded memory per key).
  */
object TopK {

  /** Keep the top `k` rows per `keys`, ranked by `order` (ties must be broken
    * by the caller passing a total order — e.g. `desc(score), asc(id)`). */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
                 rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }

  /** Keep the top `fraction` of rows per key (floor semantics: a group of 25
    * at fraction 0.1 keeps floor(2.5)=2 rows — reference `int(0.1*len)`,
    * guessLike_u_like.py:115). With the default `minKeep = 0`, groups
    * smaller than 1/fraction keep 0 rows, exactly like the reference;
    * scoring callers pass `minKeep = 1` so tiny clusters still vote
    * (engine refinement, see Scoring.topNeighbors). */
  def topFractionPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                        fraction: Double, rankCol: String = "rank",
                        minKeep: Int = 0): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wAll = Window.partitionBy(keys.map(col): _*)
    df.withColumn(rankCol, row_number().over(w))
      .withColumn("__grp_cnt", count(lit(1)).over(wAll))
      .where(col(rankCol) <=
        greatest(floor(col("__grp_cnt") * lit(fraction)), lit(minKeep)))
      .drop("__grp_cnt")
  }

  /** Global top-k: `orderBy(...).limit(k)` — Catalyst plans
    * `TakeOrderedAndProject` (per-partition heap + single reduce, no global
    * sort), which is the scalable form of the reference's
    * `sorted(...)[:k]` (guessLike_u_like.py:101-102). */
  def globalTopK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}
