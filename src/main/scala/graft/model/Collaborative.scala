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

  /** The ALS normal-equations HALF-STEP with fixed item factors — the
    * fold-in operator an offline-refit/online-serve deployment needs: a
    * user who appeared AFTER the last full fit (or whose history changed)
    * gets factors from the closed-form solve
    *
    *   x_u = (Yᵤᵀ·Yᵤ + λ·I)⁻¹ · Yᵤᵀ·r_u
    *
    * against the CURRENT item factors, without refitting O(corpus). This
    * is exactly MLlib's own final explicit-feedback update (ALS alternates
    * and ends on the user side, Cholesky-solving the same system), which
    * is what makes the engine's fit value-checkable: solveUserFactors over
    * a converged model's item factors reproduces that model's user factors
    * to float rounding (CollaborativeSpec), and the rank-2 form replays in
    * closed-form SQL (`ml2c_als_half_step`).
    *
    * Fully distributed and codegen-friendly: the rank²+rank sums are plain
    * unrolled aggregate columns (no HOFs, no UDF — one shuffle on user),
    * and the per-user solve is the native [[graft.expressions.SolveSpd]]
    * kernel. Item factors broadcast (rank·|items| doubles — model-sized);
    * at a web-scale item catalog drop the hint and let the join shuffle.
    *
    * `regByRatingCount`: λ scaled by the user's rating count (the ALS-WR
    * weighted-λ rule, which IS MLlib's explicit-feedback convention —
    * verified empirically in CollaborativeSpec: with it the half-step
    * matches model.userFactors, without it the factors come out ~λ·(n−1)
    * too large) vs plain λ. Default matches MLlib. */
  def solveUserFactors(interactions: DataFrame, itemFactors: DataFrame,
                       rank: Int, regParam: Double,
                       regByRatingCount: Boolean = true): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    require(rank >= 1, "rank must be >= 1")
    // same loud in-plan guard as fromFactors: a factor array whose length
    // disagrees with `rank` (say, factors from a rank-8 refit solved at
    // rank 4) would otherwise silently truncate — or null-pad through
    // element_at — into wrong-but-plausible user factors
    val y = itemFactors.select(col("id").cast("long").as("item"),
      when(size(col("features")) === rank,
        col("features").cast("array<double>"))
        .otherwise(raise_error(concat(
          lit(s"solveUserFactors: features length != rank $rank for id "),
          col("id").cast("string"))))
        .as("y"))
    val joined = interactions
      .select(col("user").cast("long").as("user"),
        col("item").cast("long").as("item"),
        col("rating").cast("double").as("r"))
      .join(broadcast(y), Seq("item"))
    def f(c: Int) = element_at(col("y"), c + 1)
    // upper triangle only; mirrored below (A is symmetric by construction)
    val ataCols = for (i <- 0 until rank; j <- i until rank)
      yield sum(f(i) * f(j)).as(s"a_${i}_$j")
    val atbCols = (0 until rank).map(i => sum(col("r") * f(i)).as(s"b_$i"))
    val aggCols = (ataCols ++ atbCols) :+ count(lit(1)).as("n")
    val agg = joined.groupBy("user").agg(aggCols.head, aggCols.tail: _*)
    val lam =
      if (regByRatingCount) col("n").cast("double") * lit(regParam)
      else lit(regParam)
    def aAt(i: Int, j: Int) = {
      val base = if (i <= j) col(s"a_${i}_$j") else col(s"a_${j}_$i")
      if (i == j) base + lam else base
    }
    val aArr = array((for (i <- 0 until rank; j <- 0 until rank)
      yield aAt(i, j)): _*)
    val bArr = array((0 until rank).map(i => col(s"b_$i")): _*)
    agg.select(col("user").as("id"),
      column(graft.expressions.SolveSpd(
        expression(aArr), expression(bArr))).as("features"))
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
