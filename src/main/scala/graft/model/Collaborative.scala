package graft.model

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative filtering via MLlib ALS (the north-star Spark-native
  * recommender the reference's content-based pipeline lacks). Implicit-
  * feedback mode fits the domain: collections/views are confidence
  * signals, not ratings.
  *
  * The interaction matrix distributes (blocked factors), so this scales
  * where the reference's in-memory similarity matrices cannot; serving =
  * `recommendForUserSubset` (a blocked cross-product, not a driver loop).
  */
object Collaborative {

  final case class Fitted(model: ALSModel)

  /** interactions: (user: long, item: long, weight: double-ish). */
  /** `numBlocks` must scale with the interaction matrix (~ interactions /
    * 5M per block on a cluster); measured locally, 32 blocks on a 240k-row
    * matrix is 14x SLOWER than 10 (scheduling overhead dominates) — block
    * count is a data-size knob, not a core-count knob. */
  def fit(interactions: DataFrame, rank: Int = 8, maxIter: Int = 5,
          regParam: Double = 0.1, alpha: Double = 1.0,
          seed: Long = 42L, numBlocks: Int = 10): Fitted = {
    val als = new ALS()
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setAlpha(alpha).setSeed(seed).setImplicitPrefs(true)
      .setNumUserBlocks(numBlocks).setNumItemBlocks(numBlocks)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
    // ALS requires int ids; ids outside int range are DROPPED (matching
    // the engine's drop-bad-rows policy) rather than silently wrapped —
    // a wrapped cast would collide two distinct users into one.
    val prepared = interactions
      .where(col("user").between(Int.MinValue, Int.MaxValue) &&
        col("item").between(Int.MinValue, Int.MaxValue))
      .select(
        col("user").cast("int").as("user"),
        col("item").cast("int").as("item"),
        col("rating").cast("float").as("rating"))
    val model = als.fit(prepared)
    model.setColdStartStrategy("drop")
    Fitted(model)
  }

  /** A [[Fitted]] from explicit factor matrices (id: int-castable,
    * features: array<float> of length `rank`) — the offline-refit /
    * online-serve split: a scheduled job fits and persists factors, the
    * serving tier reconstructs the model without refitting. Also what
    * makes the serving surface value-checkable: with pinned factors,
    * `recommendForUsers` is a deterministic dot-product top-k that SQL
    * can replay exactly (`ml2b_als_fixed_factors`). */
  def fromFactors(rank: Int, userFactors: DataFrame,
                  itemFactors: DataFrame): Fitted = {
    // loud plan-embedded validation (no extra job, raises at scan time):
    // a silently Int-wrapped id would MERGE two users' factors and a
    // wrong-length features array would misalign the blocked GEMM — both
    // serve wrong recommendations with no error. fit() DROPS out-of-range
    // interaction rows (lossy training signal is acceptable); a model
    // LOAD path must instead fail loudly — dropping a factor row here
    // silently changes what an existing user is served.
    def prep(df: DataFrame) = df.select(
      when(col("id").cast("long")
          .between(Int.MinValue.toLong, Int.MaxValue.toLong),
        col("id").cast("int"))
        .otherwise(raise_error(concat(
          lit("fromFactors: factor id overflows Int: "),
          col("id").cast("string"))))
        .as("id"),
      when(size(col("features")) === rank,
        col("features").cast("array<float>"))
        .otherwise(raise_error(concat(
          lit(s"fromFactors: features length != rank $rank for id "),
          col("id").cast("string"))))
        .as("features"))
    Fitted(org.apache.spark.ml.graftbridge.AlsBridge.model(
      rank, prep(userFactors), prep(itemFactors)))
  }

  /** Top-k item ids per user as (user, items array<long>). */
  def recommendForUsers(fitted: Fitted, users: DataFrame, k: Int): DataFrame =
    fitted.model.recommendForUserSubset(
        users.where(col("user").between(Int.MinValue, Int.MaxValue))
          .select(col("user").cast("int").as("user")), k)
      .select(col("user").cast("long").as("user"),
        transform(col("recommendations"), r => r.getField("item").cast("long"))
          .as("items"))

  /** Collection table → implicit interaction matrix (count-weighted). */
  def interactionsFromCollect(collect: DataFrame): DataFrame =
    collect.where(col("isCollect") === 1)
      .groupBy(col("userId").as("user"), col("bookId").as("item"))
      .agg(count(lit(1)).cast("double").as("rating"))
}
