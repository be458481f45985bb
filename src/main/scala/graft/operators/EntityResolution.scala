package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Entity resolution: cluster records whose names are near-duplicates
  * (typos, spacing, casing) and assign every record its cluster's
  * canonical name — the "same supplier spelled three ways" repair that
  * precedes any entity-keyed aggregation.
  *
  * Scale design: every expensive step runs on DISTINCT normalized names,
  * never on records — candidate generation is a self-join of the name
  * dictionary within blocking buckets (prefix blocks here; swap the block
  * column for a phonetic key upstream if the error model is aural), with
  * the pigeonhole length prune before the Levenshtein verify (codegen'd
  * built-in). Verified pairs feed [[Graph.connectedComponents]] (adaptive
  * union-find / label propagation), and records re-join the ≤|dictionary|
  * sized component map by name — one broadcast-able join back.
  */
object EntityResolution {

  /** Resolve `records` into entities: returns the input plus `entity` —
    * the lexicographically smallest normalized name reachable through
    * pairwise matches with edit distance ≤ `maxDistance` inside shared
    * `blockPrefixLen`-char blocks. Names that match nothing resolve to
    * their own normalized form.
    *
    * Blocking caveat (standard ER trade-off, document — don't hide): two
    * variants whose first `blockPrefixLen` characters differ (a typo in
    * the prefix itself) land in different blocks and will not pair; run a
    * second pass with a different block (suffix, phonetic) when recall on
    * prefix typos matters.
    *
    * Cache note: with a name dictionary large enough to push
    * [[Graph.connectedComponentsStaged]] past its small-graph threshold,
    * the component map is one retained persist — compose the staged form
    * yourself when you need the release hook; below the threshold (any
    * realistic name dictionary) nothing is retained. */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
              maxDistance: Int = 2, blockPrefixLen: Int = 3): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0 (got $maxDistance)")
    require(blockPrefixLen >= 1,
      s"blockPrefixLen must be >= 1 (got $blockPrefixLen)")
    val norm = TextFunctions.squeezeWhitespace(lower(col(nameCol)))
    val withNorm = records.withColumn("__nm", norm)
    val names = withNorm.select(col("__nm")).distinct()
    val a = names.select(col("__nm").as("a"),
      substring(col("__nm"), 1, blockPrefixLen).as("__blk"),
      length(col("__nm")).as("__la"))
    val b = names.select(col("__nm").as("b"),
      substring(col("__nm"), 1, blockPrefixLen).as("__blk"),
      length(col("__nm")).as("__lb"))
    val pairs = a.join(b,
        a("__blk") === b("__blk") && col("a") < col("b") &&
          abs(col("__la") - col("__lb")) <= maxDistance &&
          levenshtein(col("a"), col("b")) <= maxDistance)
      .select(col("a"), col("b"))
    val comps = Graph.connectedComponents(pairs, "a", "b")
      .select(col("id").as("__nm"), col("component").as("__canon"))
    withNorm.join(comps, Seq("__nm"), "left")
      .withColumn("entity", coalesce(col("__canon"), col("__nm")))
      .drop("__nm", "__canon")
  }
}
