package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget context windows ("packs") ahead of tokenization-
  * and-concatenation.
  *
  * Contiguous fill: within a partition key, documents in a deterministic
  * order fill packs by cumulative token count — pack boundary = the
  * cumulative count crossing a multiple of `maxTokens`. This is the
  * packing large pipelines actually run: it is deterministic, one window
  * cumsum over one shuffle, and parallel across `bucketCol` (packing
  * quality needs no global order — a global cumsum would serialize the
  * corpus through one partition, the classic 100 TB mistake). Greedy
  * best-fit packing buys a few percent less padding but needs stateful
  * per-partition passes; contiguous fill is the declarative default.
  */
object Packing {

  /** Adds `pack_id` (0-based within each bucket): doc d with cumulative
    * token count cum(d) (inclusive, ordered by `orderCol` within
    * `bucketCol`) lands in pack floor((cum(d) - n(d)) / maxTokens) — i.e.
    * a pack starts wherever the previous documents' tokens end. Documents
    * longer than `maxTokens` straddle packs (callers chunk them first). */
  def contiguousPack(docs: DataFrame, nTokensCol: String, maxTokens: Long,
                     bucketCol: Column, orderCol: Column): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive (got $maxTokens)")
    val w = Window.partitionBy(bucketCol).orderBy(orderCol)
    docs
      .withColumn("__cum", sum(col(nTokensCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(nTokensCol)) / maxTokens).cast("long"))
      .drop("__cum")
  }
}
