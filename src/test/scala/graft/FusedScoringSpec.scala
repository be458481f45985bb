package graft

import org.apache.spark.sql.functions._
import graft.jobs.{Recommender, RecommenderModel}
import graft.Tables

/** The fused micro-batch scoring path must be RESULT-IDENTICAL to the
  * exchange pipeline — same rounding, same tie-breaks, same floor/minKeep
  * semantics — on real model data, for both the books and the
  * similar-users surfaces. */
class FusedScoringSpec extends SparkSuite {
  import spark.implicits._

  test("fused == exchange pipeline on a real fitted model") {
    val sfDir = "/root/testdata/sf0.001"
    val part = Tables.part(spark, sfDir)
    val book = part.select(col("p_partkey").as("id"), col("p_name").as("title"),
      col("p_brand").as("author"), (col("p_retailprice") % 5 + 5).as("rating"))
    val tag = part.select(col("p_type").as("t")).distinct()
      .withColumn("id", xxhash64(col("t")).bitwiseAND(lit(Long.MaxValue)))
      .select(col("id"), col("t").as("tag"))
    val bookTag = part.join(tag, part("p_type") === tag("tag"))
      .select(col("p_partkey").as("bookId"), col("id").as("tagId"),
        (col("p_size") % 5 + 1).as("num"))
    val collect = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("userId"), col("l_partkey").as("bookId"),
        lit(1).as("isCollect"), col("o_orderdate").as("time"))
    val fitted = RecommenderModel.fit(book, tag, bookTag, collect,
      minCollected = 3, minDf = 2.0, stopWords = Nil, k = 4, hotN = 10)

    // query users = a slice of the fitted user base, scored via their own
    // model tokens (the DailyLog shape — enough to drive every stage),
    // PLUS a neighbor-less user: its token is outside the vocabulary, so
    // the exchange lane produces zero sims (no similar-users row → the
    // defaultUsers fallback) and the fused lane must do the same instead
    // of serving an empty array
    val queries = fitted.userTokens.orderBy("userId").limit(40)
      .unionByName(Seq((999999999L, 0, Seq("zzz_not_a_vocab_term")))
        .toDF("userId", "cluster", "tokens"))
    val own = fitted.userBooks
    def run(fused: Boolean): (Seq[(Long, Seq[Long])], Seq[(Long, Seq[Long])]) = {
      val serve = if (fused)
        Some(graft.rank.Scoring.buildServeAssets(fitted, collect))
      else None
      val r = Recommender.recommend(fitted, queries, own, serve = serve)
      (r.books.select(col("query").cast("long"), col("books").cast("array<long>"))
         .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq,
       r.users.select(col("query").cast("long"), col("users").cast("array<long>"))
         .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq)
    }
    val (booksF, usersF) = run(fused = true)
    val (booksE, usersE) = run(fused = false)
    assert(booksF.nonEmpty && booksF.exists(_._2.nonEmpty))
    assert(booksF == booksE, "fused books differ from the exchange pipeline")
    assert(usersF == usersE, "fused similar-users differ from the exchange pipeline")
    // the neighbor-less user must hit the defaultUsers fallback, not an
    // empty list, on BOTH lanes
    assert(usersF.find(_._1 == 999999999L)
      .exists(_._2 == Recommender.Params().defaultUsers),
      "neighbor-less user did not fall back to defaultUsers")
  }
}
