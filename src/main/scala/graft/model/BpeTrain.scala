package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.storage.StorageLevel
import graft.expressions.BpeTokenize
import graft.functions.TextFunctions

/** Byte-pair-encoding TRAINING — learning the merge table that
  * [[graft.expressions.BpeTokenize]] applies (t13). This is the "train a
  * tokenizer on your own corpus" step of an LLM pipeline, as iterative
  * corpus-wide aggregation:
  *
  *   1. one pass collapses the corpus to the (word, count) vocabulary —
  *      all later iterations run on that table, which is VOCAB-sized, not
  *      corpus-sized (the classic Sennrich formulation);
  *   2. each merge step re-segments every word with the merges learned so
  *      far (the same plan-embedded BpeTokenize the apply path uses — so
  *      train and apply cannot diverge), explodes adjacent symbol pairs,
  *      and takes the count-weighted argmax pair. One bounded shuffle per
  *      step; only the single winning pair reaches the driver.
  *
  * Determinism: counts are integral and ties break lexicographically on
  * (w1, w2), so the learned table is bit-stable. At 100 TB the word-count
  * pass is the only corpus-scale job; the iteration cost depends on
  * |vocab| alone.
  */
object BpeTrain {

  /** Learn up to `numMerges` merges; stops early when no adjacent pair
    * repeats. Returns merges in learned (= priority) order. */
  def learn(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1 (got $numMerges)")
    val words = docs
      .select(explode(TextFunctions.tokenize(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    words.count() // materialize: every iteration re-reads this table
    try {
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      while (!exhausted && merges.length < numMerges) {
        val syms = column(BpeTokenize(expression(col("word")), merges))
        // native AdjacentPairs (r14): one primitive pass per word instead
        // of the interpreted transform+element_at lambda, and no size>=2
        // pre-filter — the filter referenced the BpeTokenize column and
        // could double-evaluate the (expensive, merge-list-long) segmenter
        // per row (guide §4.4's duplicated-expression trap); exploding an
        // empty pair array yields no rows, so results are identical.
        val best = words
          .select(col("cnt"), syms.as("s"))
          .select(col("cnt"),
            explode(column(graft.expressions.AdjacentPairs(
              expression(col("s")), padded = false))).as("p"))
          .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .agg(sum(col("cnt")).as("n"))
          // a pair occurring once can be merged but never reused — stop at
          // frequency 2 like the reference implementation
          .where(col("n") >= 2)
          .orderBy(col("n").desc, col("w1").asc, col("w2").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else merges :+= ((best(0).getString(0), best(0).getString(1)))
      }
      merges
    } finally words.unpersist()
  }
}
