package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Edition dedup + rating re-rank of similar-book candidates
  * (SURVEY §2.7 F7, §2.6 SO3, §2.5 W4/W5).
  *
  * Reference (simility_books.py:74-92): for each source book's top-100
  * similar list, normalize titles (truncate at bracket/digit/edition
  * markers, strip punctuation), drop candidates whose normalized title
  * equals the source's or duplicates an earlier candidate's, then re-order
  * the survivors by rating desc and cap.
  */
object TitleDedup {

  /** pairs(a, b, sim, rank) ⋈ books(bookId, title, rating) →
    * (a, b, rating, pos) with normalized-title dedup (keep the
    * best-similarity representative), self-title excluded, re-ranked by
    * rating desc (tie: b asc), capped at `k`. */
  def dedupAndRerank(pairs: DataFrame, books: DataFrame, k: Int): DataFrame = {
    val titled = books.select(col("bookId"),
      TextFunctions.normalizeTitle(col("title")).as("norm"),
      col("rating"))
    val withA = pairs
      .join(titled.select(col("bookId").as("a"), col("norm").as("normA")), "a")
      .join(titled.select(col("bookId").as("b"), col("norm").as("normB"),
        col("rating")), "b")
      .where(col("normB") =!= col("normA"))
    // one candidate per normalized title, keeping the most similar
    val dedupW = Window.partitionBy("a", "normB").orderBy(col("rank").asc)
    val deduped = withA.withColumn("dd", row_number().over(dedupW))
      .where(col("dd") === 1)
    // W4: re-rank survivors by rating
    val rerankW = Window.partitionBy("a")
      .orderBy(col("rating").desc, col("b").asc)
    deduped.withColumn("pos", row_number().over(rerankW))
      .where(col("pos") <= k)
      .select("a", "b", "rating", "pos")
  }
}
