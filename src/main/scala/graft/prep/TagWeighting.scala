package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Weighting

/** Weighted per-book tag documents (SURVEY §2.4 A1/A2, §2.7 F4, §2.3 J1).
  *
  * Reference pipeline (simility_books.py:37-41, guessLike_u_like.py:50-53):
  * join `tbl_book_tag` with `tbl_tag`, bucket each book's tag counts into
  * weights 1..4 with the min-max formula, then repeat each tag `w` times in
  * the book's document string — term-frequency weighting by duplication.
  *
  * Spark-first: broadcast the (small) tag dimension, window min/max for the
  * buckets, `array_repeat`+`flatten` for the duplication, deterministic
  * ordering via `sort_array` on (tagId) before assembly (the reference
  * relied on `ORDER BY bookId` input order, SURVEY §4.2).
  */
object TagWeighting {

  /** bookTag(bookId, tagId, num) ⋈ tag(id, tag) → (bookId, tagDoc). */
  def weightedTagDocs(bookTag: DataFrame, tag: DataFrame): DataFrame = {
    val joined = bookTag.join(broadcast(tag), bookTag("tagId") === tag("id"))
      .select(col("bookId"), col("tagId"), col("tag"), col("num"))
    val bucketed = Weighting.minMaxBucket(joined, "bookId", "num", 4, "w")
    bucketed
      .groupBy("bookId")
      .agg(sort_array(collect_list(struct(col("tagId"), col("tag"), col("w"))))
        .as("tags"))
      .select(col("bookId"),
        concat_ws(" ",
          flatten(transform(col("tags"),
            t => array_repeat(t.getField("tag"), t.getField("w").cast("int")))))
          .as("tagDoc"))
  }
}
