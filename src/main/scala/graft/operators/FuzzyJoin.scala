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

  /** Jaro-Winkler fuzzy join — [[editDistanceForQueries]]'s shape with a
    * SIMILARITY threshold instead of a distance budget: pairs (a = query
    * id, b = corpus id, jw) with Jaro-Winkler >= `minSim`. Same 100 TB
    * form (broadcast query side, corpus only scans, one pass) and the
    * same completeness-preserving length prune: Jaro is bounded above by
    * (1/3)(m/|a| + 2) with m <= min(|a|,|b|), and the Winkler boost at
    * prefix 4 maps that bound to b(j) = j + 0.4(1-j) — so a length ratio
    * below the inverted bound can never clear `minSim`. The exact
    * algebra: jw >= s requires min/max >= (3·(s-0.4)/0.6 - 2) when
    * s > 0.7 (asserted against the unpruned brute force in
    * FuzzyJoinSpec). Lengths for the prune are measured in UTF-16 CODE
    * UNITS (octet_length of the UTF-16LE encoding / 2) — the same unit
    * [[graft.expressions.JaroWinkler]] scores in — so the bound holds for
    * supplementary-plane text too (`length()` counts codepoints, which
    * can halve the ratio for astral input and void the derivation).
    * Scores via [[graft.expressions.JaroWinkler]] (DuckDB-equivalent, so
    * the d18 gate hash-matches). */
  def jaroWinklerForQueries(rows: DataFrame, idCol: String, textCol: String,
                            queryPred: Column, minSim: Double): DataFrame = {
    require(minSim > 0.7 && minSim <= 1.0,
      s"minSim must be in (0.7, 1] (got $minSim) — below the Winkler " +
        "boost threshold the prefix bound is not valid and the screen " +
        "degenerates to a full cross product")
    import graft.functions.TextFunctions.jaroWinkler
    // invert the prefix-boosted Jaro upper bound: with m <= min and
    // jaro <= (min/max + 2) / 3, jw <= jaro + 0.4 (1 - jaro) clears s
    // only if min/max >= 3 (s - 0.4) / 0.6 - 2
    val minRatio = math.max(0.0, 3.0 * (minSim - 0.4) / 0.6 - 2.0)
    // UTF-16 code units, the kernel's unit (see scaladoc)
    val cu = (c: Column) => octet_length(encode(c, "UTF-16LE")) / 2
    val base = rows.select(col(idCol).as("id"), col(textCol).as("t"))
    val q = base.where(queryPred).select(col("id").as("a"), col("t").as("ta"))
    val c = base.select(col("id").as("b"), col("t").as("tb"))
    c.join(broadcast(q),
        col("a") =!= col("b") &&
          least(cu(col("ta")), cu(col("tb"))).cast("double") >=
            greatest(cu(col("ta")), cu(col("tb"))) * minRatio)
      .withColumn("jw", jaroWinkler(col("ta"), col("tb")))
      .where(col("jw") >= minSim)
      .select("a", "b", "jw")
  }
}
