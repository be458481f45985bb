package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global popularity ranking (SURVEY §2.4 A7, §2.5 W2).
  *
  * Reference (guessLike_u_like.py:95-104): count how often each book is
  * collected across all users, sort desc, keep top 30.
  *
  * Spark: explode → partial-agg count → `TakeOrderedAndProject` — one
  * shuffle, heap-based top-k, no global sort. Deterministic tie-break by
  * bookId (the reference's dict-iteration order was arbitrary).
  */
object HotBooks {

  /** userBooks(userId, books array) → (bookId, cnt) top `n`. */
  def hot(userBooks: DataFrame, n: Int = 30): DataFrame =
    userBooks.select(explode(col("books")).as("bookId"))
      .groupBy("bookId").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bookId").asc)
      .limit(n)
}
