package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how target-like its hashed n-gram profile is —
  * the log-likelihood ratio between a target-slice bucket unigram model
  * and a raw-corpus bucket unigram model — then resample the corpus
  * toward the target distribution with Gumbel top-k.
  *
  * The whole computation is declarative and stays distributed at any
  * corpus size:
  *  - one explode of the gram column, immediately projected to a HASHED
  *    bucket id (8 bytes/gram — the gram strings never ride a shuffle);
  *  - per-(doc, bucket) counts (shuffle keyed on (doc, bucket));
  *  - the corpus-level bucket counts RE-AGGREGATE from the per-doc counts,
  *    so the second shuffle's input is |doc×bucket| rows, not |grams|, and
  *    Spark's ReusedExchange dedups the shared explode+partial-agg subtree
  *    between the two consumers;
  *  - the "trained model" is a ≤`buckets`-row log-ratio frame that AQE
  *    broadcasts back onto the per-doc counts — no driver-side state.
  */
object Dsir {

  /** Per-document DSIR importance log-weight
    *
    *   logw(d) = Σ_b c_d[b] · ( ln p̂_t[b] − ln p̂_r[b] )
    *
    * over hashed gram buckets, where p̂ are add-one-smoothed bucket
    * frequencies of the target slice (rows where `isTarget`) and of the
    * full raw input. High logw = the document's gram profile looks like
    * the target distribution. The raw corpus must CONTAIN the scored
    * documents (it is the input itself), so every doc bucket has a raw
    * count and absent buckets never need back-filling.
    *
    * @param gramsCol array<string> feature grams per row (e.g. unigrams ++
    *                 bigrams of the tokenized text)
    * @param bucketOf gram string -> bucket in [0, buckets); defaults to
    *                 xxhash64 mod buckets (swap for the FNV-1a-64 form when
    *                 an external system must replay the bucketing)
    * @return (idCol, logw: double, n_grams: long), one row per input row
    *         with a non-empty gram list
    */
  def importanceWeights(docs: DataFrame, idCol: String, gramsCol: Column,
                        isTarget: Column, buckets: Int,
                        bucketOf: Column => Column = null): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2 (got $buckets)")
    val bkt: Column => Column =
      if (bucketOf != null) bucketOf
      else g => pmod(xxhash64(g), lit(buckets.toLong))
    val g = docs
      .select(col(idCol).as("__id"), isTarget.as("__t"), gramsCol.as("__gs"))
      .select(col("__id"), col("__t"), explode(col("__gs")).as("__g"))
      .select(col("__id"), col("__t"), bkt(col("__g")).as("__b"))
    weightsFromBuckets(g, idCol, buckets)
  }

  /** [[importanceWeights]] specialized to the standard token-array +
    * unigram∪bigram feature set: gram hashing runs in ONE native pass per
    * row ([[graft.expressions.TokenGramHashes]] — no interpreted
    * `transform` lambda, no intermediate gram strings on the FNV path)
    * and only 8-byte hashes ride the explode. Exactly the same buckets,
    * counts and weights as `importanceWeights(docs, id,
    * unigramBigram(toks), …)` with the matching `bucketOf` (`fnv = true` ⇒
    * the [[graft.expressions.Fnv1a64]] replayable form, `false` ⇒ the
    * default `xxhash64`); DsirSpec pins the equivalence. */
  def importanceWeightsTokens(docs: DataFrame, idCol: String, toksCol: Column,
                              isTarget: Column, buckets: Int,
                              fnv: Boolean = false): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2 (got $buckets)")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val hashes =
      column(graft.expressions.TokenGramHashes(expression(toksCol), fnv))
    val g = docs
      .select(col(idCol).as("__id"), isTarget.as("__t"), hashes.as("__hs"))
      .select(col("__id"), col("__t"), explode(col("__hs")).as("__h"))
      .select(col("__id"), col("__t"),
        pmod(col("__h"), lit(buckets.toLong)).as("__b"))
    weightsFromBuckets(g, idCol, buckets)
  }

  /** Shared aggregation tail: per-(doc, bucket) counts → corpus/target
    * bucket LMs → smoothed log-ratio → per-doc weight (see
    * [[importanceWeights]]'s scaladoc for the plan-shape invariants). */
  private def weightsFromBuckets(g: DataFrame, idCol: String,
                                 buckets: Int): DataFrame = {
    val docb = g.groupBy("__id", "__t", "__b").agg(count(lit(1)).as("__c"))
    val bc = docb.groupBy("__b").agg(
      sum(col("__c")).as("__cr"),
      sum(when(col("__t"), col("__c")).otherwise(0L)).as("__ct"))
    val tot = bc.agg(sum(col("__cr")).as("__nr"), sum(col("__ct")).as("__nt"))
    val lr = bc.crossJoin(broadcast(tot))
      .select(col("__b"),
        (log((col("__ct") + 1).cast("double") / (col("__nt") + buckets)) -
          log((col("__cr") + 1).cast("double") / (col("__nr") + buckets)))
          .as("__lr"))
    // broadcast the MODEL side explicitly: lr is ≤`buckets` rows by
    // construction, while docb is |docs × buckets| — size estimation over
    // the explode is unreliable enough that the static planner can pick
    // the wrong build side without the hint
    docb.join(broadcast(lr), Seq("__b"))
      .groupBy("__id")
      .agg(sum(col("__c") * col("__lr")).as("logw"),
        sum(col("__c")).cast("long").as("n_grams"))
      .withColumnRenamed("__id", idCol)
  }

  /** Unigram ++ bigram gram column over a token array — the paper's
    * hashed-n-gram feature set (n ≤ 2). Bigrams join with a single space;
    * single-token rows contribute their unigram only. */
  def unigramBigram(toks: Column): Column =
    concat(toks,
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>")))

  /** Gumbel top-k resample over importance weights: the k largest values
    * of logw − ln(−ln u) with u ∈ (0,1) i.i.d. per row are a WITHOUT-
    * replacement sample with inclusion ∝ softmax(logw) (the Gumbel-max
    * trick) — DSIR's sampling step. Deterministic given a deterministic u
    * (derive it from the id hash as [[Sampling.weightedSample]] does).
    * Plan shape: projection + TakeOrderedAndProject — per-partition heaps,
    * one k-row reduce, no global sort. */
  def resampleTopK(weights: DataFrame, idCol: String, logwCol: String,
                   u: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    weights.withColumn("__gkey", col(logwCol) - log(-log(u)))
      .orderBy(col("__gkey").desc, col(idCol).asc)
      .limit(k)
      .drop("__gkey")
  }
}
