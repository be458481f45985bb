package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Book document assembly (SURVEY §2.7 F1-F5, §2.3 J2/J4, §2.2 P2).
  *
  * Reference (simility_books.py:17-20,45-53; guessLike_u_like.py:58-64):
  * authors are lowercased, inner whitespace removed, comma-split, space-
  * joined; the book document is `tagDoc + ' ' + authors + ' ' + authors`
  * (the doubling is the reference's author up-weighting). Rows with null
  * title/author/rating are dropped (pandas index-aligned ops + dropna act
  * as an inner join — we use explicit inner join + na.drop).
  */
object Documents {

  /** Normalized space-joined author tokens from the raw comma-separated
    * author field. */
  def authorTokens(author: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(TextFunctions.splitCsvField(lower(author)), " ")

  /** book(id,title,author,rating) ⋈ tagDocs(bookId,tagDoc)
    * → (bookId, title, rating, doc). */
  def bookDocs(book: DataFrame, tagDocs: DataFrame): DataFrame =
    book.na.drop(Seq("title", "author", "rating"))
      .select(col("id").as("bookId"), col("title"), col("rating"),
        authorTokens(col("author")).as("auth"))
      .join(tagDocs, "bookId")
      .select(col("bookId"), col("title"), col("rating"),
        TextFunctions.squeezeWhitespace(
          concat_ws(" ", col("tagDoc"), col("auth"), col("auth"))).as("doc"))
}
