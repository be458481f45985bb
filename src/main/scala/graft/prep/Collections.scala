package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** User collection preprocessing (SURVEY §2.1 S3, §2.4 A4/A6, §2.3 J3).
  *
  * Reference (guessLike_u_like.py:46-47,31-37,67): users with more than 15
  * collected books (`GROUP_CONCAT ... HAVING COUNT(bookId)>15`, then a
  * string→eval round-trip we skip by keeping arrays native); each user's
  * document is the concatenation of their collected books' documents with
  * double spaces squeezed, books missing from the doc index silently
  * skipped (inner join).
  */
object Collections {

  /** collect(userId, bookId, isCollect, time) → (userId, books array),
    * collected-only, users with more than `minBooks`. */
  def userBookLists(collect: DataFrame, minBooks: Int = 15): DataFrame =
    collect.where(col("isCollect") === 1)
      .groupBy("userId")
      .agg(sort_array(collect_set(col("bookId"))).as("books"))
      .where(size(col("books")) > minBooks)   // distinct count = set size
      .select("userId", "books")

  /** Latest `k` collected books per user by collect time (the reference's
    * per-event query `ORDER BY time desc` + [:3],
    * guessLike_u_like.py:189,203). */
  def latestBooks(collect: DataFrame, k: Int): DataFrame =
    graft.operators.TopK.topKPerKey(
        collect.where(col("isCollect") === 1),
        Seq("userId"), Seq(col("time").desc, col("bookId").asc), k)
      .groupBy("userId")
      .agg(collect_list(struct(col("rank"), col("bookId"))).as("rb"))
      .select(col("userId"),
        transform(sort_array(col("rb")), r => r.getField("bookId")).as("books"))

  /** (userId, books) x bookDocs(bookId, doc) → (userId, userDoc): explode,
    * inner join (missing books drop out), re-group with deterministic
    * book-id order, squeeze whitespace. */
  def userDocs(userBooks: DataFrame, bookDocs: DataFrame): DataFrame =
    userBooks
      .select(col("userId"), explode(col("books")).as("bookId"))
      .join(bookDocs.select("bookId", "doc"), "bookId")
      .groupBy("userId")
      .agg(sort_array(collect_list(struct(col("bookId"), col("doc")))).as("bd"))
      .select(col("userId"),
        TextFunctions.squeezeWhitespace(
          concat_ws(" ", transform(col("bd"), x => x.getField("doc")))).as("userDoc"))
}
