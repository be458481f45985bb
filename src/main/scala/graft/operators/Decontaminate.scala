package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove (or flag) corpus documents that share
  * at least `minHits` distinct character n-grams with a held-out
  * evaluation/benchmark set — the standard guard against test-set leakage
  * into LLM training data (long n-gram overlap, as popularized by the
  * GPT-3/PaLM data notes; typical n is 10-20 chars or ~13 tokens).
  *
  * Scale shape: the BENCHMARK side is small (eval sets are thousands of
  * documents) and collapses to a distinct 8-byte n-gram hash set, collected
  * once and shipped to executors via broadcast; the CORPUS side — the
  * 100 TB side — is a pure projection over the scan
  * ([[graft.expressions.BroadcastSetHits]]: one sorted-array binary-search
  * pass per document). No explode, no join, no shuffle, no driver-side
  * loop over corpus rows; the corpus never materializes its n-grams
  * anywhere but inside the per-row kernel. */
object Decontaminate {

  /** Distinct n-gram hashes of the benchmark set as a sorted array.
    * `maxGrams` bounds driver memory (8 bytes per gram; the default 64M
    * grams ≈ 512 MB — far above any real eval suite) and fails fast with
    * a clear message rather than OOMing the driver. */
  def benchmarkGrams(benchmark: DataFrame, textCol: String, n: Int,
                     maxGrams: Int = 1 << 26): Array[Long] = {
    val grams = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .distinct()
      .limit(maxGrams + 1)
      .collect().map(_.getLong(0))
    require(grams.length <= maxGrams,
      s"benchmark set exceeds $maxGrams distinct $n-grams — decontaminate " +
        "in shards or raise maxGrams if the driver has headroom")
    java.util.Arrays.sort(grams)
    grams
  }

  /** Column: number of the document's distinct n-gram hashes present in
    * the (sorted) benchmark gram array. */
  def hitsColumn(textCol: Column, grams: Array[Long], n: Int,
                 spark: org.apache.spark.sql.SparkSession): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val bc = spark.sparkContext.broadcast(grams)
    column(graft.expressions.BroadcastSetHits(
      expression(Dedup.shingles(textCol, n)), bc))
  }

  /** Corpus with an `overlap_hits` column appended — the audit form
    * (inspect the overlap distribution before choosing `minHits`). */
  def withHits(corpus: DataFrame, benchmark: DataFrame, textCol: String,
               n: Int): DataFrame =
    corpus.withColumn("overlap_hits",
      hitsColumn(col(textCol), benchmarkGrams(benchmark, textCol, n), n,
        corpus.sparkSession))

  /** The decontaminated corpus: documents with fewer than `minHits`
    * distinct shared n-grams survive. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, textCol: String,
                    n: Int = 20, minHits: Int = 3): DataFrame =
    withHits(corpus, benchmark, textCol, n)
      .where(col("overlap_hits") < minHits)
      .drop("overlap_hits")
}
