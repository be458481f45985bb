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

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram forms above: drop every document whose embedding is within
    * `minCosine` of ANY benchmark embedding. Catches paraphrased eval
    * leakage that verbatim n-gram overlap can't see (and nothing else —
    * run it IN ADDITION to, not instead of, the verbatim pass).
    *
    * Two routes, switched on benchmark size (`maxBroadcastRows`):
    *   - BROADCAST scan (benchmark <= the threshold — the common case,
    *     eval suites are thousands of vectors): the benchmark broadcasts
    *     and the scan is one pass over the corpus embeddings with the
    *     native cosine kernel per (doc, bench) pair; no shuffle of the
    *     corpus at all (left_anti against the distinct hit ids is the
    *     only exchange and it carries ids only). Exact.
    *   - IVF probe ([[Ann.ivfThresholdHits]], benchmark above the
    *     threshold): benchmark vectors land in coarse-quantizer cells,
    *     corpus docs probe their `nProbe` nearest cells, exact cosine
    *     verifies inside the probed cells — |corpus|·|bench| comparisons
    *     become |corpus|·nProbe·(|bench|/cells). Verify-exact (no false
    *     drops beyond probe recall); recall dials are nProbe/nCentroids.
    * Decontamination is recall-critical, so the broadcast threshold is
    * generous by default — the IVF route exists for benchmark sets that
    * genuinely cannot ship to every executor. */
  def semantic(corpus: DataFrame, idCol: String, vecCol: String,
               benchmark: DataFrame, benchVecCol: String,
               minCosine: Double, maxBroadcastRows: Long = 2000000L,
               nCentroids: Int = 64, nProbe: Int = 8): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"minCosine must be in (0, 1] (got $minCosine)")
    val hits =
      if (benchmark.limit(math.min(maxBroadcastRows + 1,
            Int.MaxValue.toLong).toInt).count() <= maxBroadcastRows) {
        val b = broadcast(benchmark.select(col(benchVecCol).as("__bv")))
        corpus.select(col(idCol), col(vecCol).as("__v"))
          .crossJoin(b)
          .where(graft.functions.VectorFunctions.cosine(col("__v"), col("__bv"))
            >= minCosine)
          .select(col(idCol)).distinct()
      } else
        Ann.ivfThresholdHits(corpus, idCol, vecCol, benchmark, benchVecCol,
          minCosine, nCentroids, nProbe)
    corpus.join(hits, Seq(idCol), "left_anti")
  }
}
