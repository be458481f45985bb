package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) fuzzy matching — the string-level near-dup
  * family member the shingle operators don't cover: catches single-character
  * typos and small edits that change many n-grams at once (a 1-char edit in
  * an n-char string disturbs up to n shingles, so Jaccard-style candidates
  * miss exactly the pairs edit distance is for).
  *
  * Extends the reference's normalize-then-exact-match title dedup
  * (simility_books.py:74-89) to tolerant matching. Spark-first shape: the
  * query side is broadcast (the query-vs-corpus form every other similarity
  * operator here uses), the length prefilter rides IN the join condition so
  * the codegen'd `levenshtein` kernel only runs on length-compatible pairs,
  * and the kernel itself is the thresholded built-in — O(maxDist * min(len))
  * per pair with early exit, not full O(len^2).
  */
object FuzzyJoin {

  /** Pairs (a = query id, b = corpus id, dist) with edit distance
    * `<= maxDist`, for query rows matching `queryPred` (a predicate over the
    * renamed `id` column, same convention as the Dedup query-vs-corpus
    * operators). The corpus side only scans; the query side must be
    * broadcastable — at 100 TB that is the form that works, an all-pairs
    * fuzzy join over an unbounded corpus is not a computable query.
    *
    * `||len(a)| - |len(b)|| <= maxDist` is a necessary condition for
    * `levenshtein(a, b) <= maxDist`, so the length guard in the join
    * condition is a pure prune — completeness is preserved (asserted by
    * FuzzyJoinSpec against the unpruned brute force). */
  def editDistanceForQueries(rows: DataFrame, idCol: String, textCol: String,
                             queryPred: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0 (got $maxDist)")
    val base = rows.select(col(idCol).as("id"), col(textCol).as("t"))
    val q = base.where(queryPred).select(col("id").as("a"), col("t").as("ta"))
    val c = base.select(col("id").as("b"), col("t").as("tb"))
    c.join(broadcast(q),
        col("a") =!= col("b") &&
          abs(length(col("ta")) - length(col("tb"))) <= maxDist)
      // thresholded form: returns -1 when the distance exceeds maxDist,
      // letting the kernel abandon a pair after maxDist+1 diagonal misses
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .where(col("dist") >= 0)
      .select("a", "b", "dist")
  }
}
