package graft.rank

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candidate blending: hot-book exclusion, collected-book anti-filter,
  * seeded hot backfill, hot-list fallback (SURVEY §2.6 SO1/SO2, §2.2 P7,
  * §2.5 W7, §2.8 ST6).
  *
  * Reference (guessLike_u_like.py:126,210; log_analyze.py:181): candidates
  * minus hot books, plus 5 random hot books appended, minus the user's own
  * collected books, capped; on any scoring failure the user gets the plain
  * hot list (the reference's intent — its fallback code paths are buggy,
  * SURVEY §4.2, and we implement the evident intent).
  *
  * All randomness is seeded: the "random 5 hot books" become a per-user
  * deterministic hash-ordered pick, so tests are exact and reruns stable.
  */
object Blend {

  /** Hard cap on any driver-side hot-list collect. The reference's hot list
    * is top-30 (guessLike_u_like.py:101-102); anything near this bound is a
    * misuse of the API (an unbounded `hot` input must stay distributed), so
    * we fail fast rather than silently materialize it on the driver. */
  val MaxHotCollect = 4096

  /** Bounded driver collect of the hot-id column: limits BEFORE collecting
    * so an unbounded input can never OOM the driver, and rejects inputs at
    * the cap (they were not "small" as the contract requires). */
  private def collectHotIds(hot: DataFrame): Array[Long] = {
    val ids = hot.limit(MaxHotCollect + 1).collect().map(_.getLong(0))
    require(ids.length <= MaxHotCollect,
      s"hot list exceeds $MaxHotCollect rows; keep it distributed instead")
    ids
  }

  /** W7 seeded backfill pick as a reusable expression: the first `n` hot ids
    * ordered by xxhash64(id, user, seed) — a per-user deterministic "random"
    * sample (the reference's `random.sample(hot, 5)`, guessLike_u_like.py:126,
    * made reproducible). */
  def seededHotPick(hotArr: Column, user: Column, n: Int, seed: Long): Column =
    seededHotPickBy(hotArr, user, n,
      (b, u) => xxhash64(b, u, lit(seed)))

  /** [[seededHotPick]] with a caller-supplied per-(candidate, user) hash —
    * lets the hash be swapped (e.g. the DuckDB-recomputable FNV-1a-64 of
    * the `w7b` gate) without touching the pick rule: candidates sort by
    * (hash, id) and the first `n` win. */
  def seededHotPickBy(hotArr: Column, user: Column, n: Int,
                      hash: (Column, Column) => Column): Column =
    slice(
      transform(
        sort_array(transform(hotArr,
          b => struct(hash(b, user).as("h"), b.as("b")))),
        s => s.getField("b")),
      1, n)

  /** candidates(query, bookId, score, rank) → (query, books array) after:
    * hot exclusion (SO1), per-user seeded 5-hot backfill appended (W7/SO2),
    * own-books anti-filter (P7), cap at `recCap` (W5).
    *
    * `ownBooks`: (userId, books array) of books the user already has —
    * never recommended. `hot`: (bookId, cnt) hot list. */
  def blend(candidates: DataFrame, hot: DataFrame, ownBooks: DataFrame,
            recCap: Int, backfill: Int = 5, seed: Long = 42L): DataFrame = {
    val hotIds = collectHotIds(hot.select(col("bookId")).orderBy(col("bookId")))
    val hotArr = array(hotIds.map(lit(_)): _*)

    val nonHot = candidates
      .join(broadcast(hot.select(col("bookId"))), Seq("bookId"), "left_anti")
    // keep every query that HAD candidates, even if the hot anti-join ate
    // them all — those users still get the seeded backfill (the reference
    // appends its 5 random hot books to an empty filtered list,
    // guessLike_u_like.py:126), not the full hot-list fallback
    val allQueries = candidates.select(col("query")).distinct()
    val ranked = allQueries
      .join(nonHot
        .groupBy(col("query"))
        .agg(collect_list(struct(col("rank"), col("bookId"))).as("rb")),
        Seq("query"), "left")
      .select(col("query"),
        coalesce(
          transform(sort_array(col("rb")), x => x.getField("bookId")),
          array().cast("array<bigint>")).as("cand"))
    // seeded per-user hot pick: order hot ids by xxhash64(bookId, userId)
    val withBackfill = ranked.withColumn("hotPick",
      seededHotPick(hotArr, col("query"), backfill, seed))
      .withColumn("blended",
        concat(col("cand"), array_except(col("hotPick"), col("cand"))))
    withBackfill
      .join(ownBooks.select(col("userId").as("query"), col("books").as("own")),
        Seq("query"), "left")
      .select(col("query"),
        slice(array_except(col("blended"), coalesce(col("own"), array())), 1, recCap)
          .as("books"))
  }

  /** ST6 fallback: every user in `allUsers` (userId) missing from `recs`
    * (query, books) gets the top-`recCap` hot list. */
  def withFallback(recs: DataFrame, allUsers: DataFrame, hot: DataFrame,
                   recCap: Int): DataFrame = {
    val hotIds = collectHotIds(hot.orderBy(col("cnt").desc, col("bookId").asc)
      .select("bookId").limit(recCap))
    val hotArr = array(hotIds.map(lit(_)): _*)
    allUsers.select(col("userId").as("query"))
      .join(recs, Seq("query"), "left")
      .select(col("query"), coalesce(col("books"), hotArr).as("books"))
  }

  /** ST6 fallback for similar-user lists: users missing from `users`
    * (query, users array) get the configured default id list — the
    * reference emits a hard-coded default user string on scoring failure
    * (guessLike_u_like.py:174-175; SURVEY ST6 "keep the exact default
    * semantics" — the literal is deployment config, so it is a parameter
    * here with the reference's leading ids as the default). */
  def withUserFallback(users: DataFrame, allUsers: DataFrame,
                       defaultUsers: Seq[Long]): DataFrame = {
    val defArr = array(defaultUsers.map(lit(_)): _*)
    allUsers.select(col("userId").as("query"))
      .join(users, Seq("query"), "left")
      .select(col("query"), coalesce(col("users"), defArr).as("users"))
  }
}
