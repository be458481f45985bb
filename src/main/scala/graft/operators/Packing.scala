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

  /** First-fit-decreasing bin packing per bucket — the padding-minimizing
    * upgrade of [[contiguousPack]]: docs sorted by token count descending
    * (ties by id) each land in the FIRST open pack with room, opening a
    * new pack otherwise. FFD wastes at most ~22% over optimal (11/9·OPT+1,
    * the classic bound) and in practice beats contiguous fill by the long
    * tail it pairs with short docs. A doc longer than `maxTokens` gets a
    * pack of its own (callers chunk oversized docs first).
    *
    * FFD is inherently sequential, so — exactly like
    * [[graft.rank.Diversify]]'s bounded greedy — it runs per bucket inside
    * `flatMapGroups`, parallel ACROSS buckets, and fails fast when a
    * bucket exceeds `maxGroup` docs rather than silently serializing a
    * 100 TB corpus through one task. Buckets are the parallelism unit:
    * packing quality needs no cross-bucket order.
    *
    * Returns (bucket: string, id, n_tokens, pack_id). */
  def ffdPack(docs: DataFrame, idCol: String, nTokensCol: String,
              maxTokens: Long, bucketCol: Column,
              maxGroup: Int = 1 << 16): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive (got $maxTokens)")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(bucketCol.cast("string").as("bucket"),
        col(idCol).cast("long").as("id"),
        col(nTokensCol).cast("long").as("n"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (bucket: String, it: Iterator[(String, Long, Long)]) =>
        val items = it.toArray
        if (items.length > maxGroup)
          throw new IllegalStateException(
            s"ffdPack: bucket '$bucket' has ${items.length} docs " +
              s"(> maxGroup $maxGroup) — repartition into finer buckets")
        val sorted = items.sortBy { case (_, id, n) => (-n, id) }
        val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.iterator.map { case (_, id, n) =>
          val idx = remaining.indexWhere(_ >= n)
          val pack =
            if (idx >= 0) { remaining(idx) -= n; idx }
            else { remaining += math.max(maxTokens - n, 0L); remaining.length - 1 }
          (bucket, id, n, pack.toLong)
        }
      }
      .toDF("bucket", "id", "n_tokens", "pack_id")
  }
}
