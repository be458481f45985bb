package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** The operational loop for a GROWING deduplicated corpus — the dedup
  * counterpart of [[IndexIngestJob]] (r11): each micro-batch of new
  * documents is near-dup-deduplicated against everything accepted so
  * far, survivors land in `dir/survivors/batch=N`, and the survivors'
  * LSH bands + shingle sets are appended to `dir/index/` so the NEXT
  * batch dedups against them too. A 100 TB ingest pipeline runs exactly
  * this shape: the index grows O(survivors), each batch pays
  * O(batch × colliding buckets) — never O(corpus²) and never a corpus
  * rescan (the d7 operator, closed under a stream).
  *
  * Layout (all appends are per-batch `batch=N` subdirs written with
  * overwrite — the idempotence anchor, see below):
  *
  *   dir/index/banded/batch=N    — (id, band, bucket) of batch N's survivors
  *   dir/index/shingled/batch=N  — (id, sh) shingle sets of the same rows
  *   dir/survivors/batch=N       — the accepted documents themselves
  *
  * Delivery semantics: with a `checkpointLocation` over a replayable
  * source this is at-least-once, and the replay is RESULT-idempotent:
  *  - every write is keyed by the deterministic micro-batch id and mode
  *    "overwrite", so a replayed batch rewrites the same three dirs with
  *    the same rows rather than appending duplicates;
  *  - a replayed batch re-dedups against an index that may already hold
  *    ITS OWN first-attempt rows — identical-id self-matches are
  *    excluded by id (`a =!= b`), and with `dedupWithinBatch = true`
  *    (default) any two same-batch survivors have Jaccard below the
  *    threshold by construction, so none of them can knock another out
  *    on replay. With `dedupWithinBatch = false` a replayed batch could
  *    drop a first-attempt survivor that near-duplicates a same-batch
  *    row — run within-batch dedup (or dedup upstream) when replay
  *    matters.
  * Batches run serially per query, satisfying the single-writer layout.
  *
  * Bootstrap: [[seed]] indexes an existing corpus as `batch=-1` so the
  * stream dedups against history from its first trigger. */
object DedupIngestJob {

  /** Index an existing corpus (already deduplicated) as the stream's
    * starting state. Seed documents are NOT rewritten to survivors/ —
    * they already live wherever the corpus lives. */
  def seed(corpus: DataFrame, idCol: String, textCol: String, dir: String,
           shingleN: Int = 3, bands: Int = 12, rows: Int = 8): Unit =
    writeIndexShard(corpus, idCol, textCol, dir, -1L, shingleN, bands, rows)

  def start(docs: DataFrame, idCol: String, textCol: String, dir: String,
            shingleN: Int = 3, bands: Int = 12, rows: Int = 8,
            minJaccard: Double = 0.8, maxBucket: Long = 200L,
            dedupWithinBatch: Boolean = true,
            trigger: Trigger = Trigger.AvailableNow(),
            checkpointLocation: Option[String] = None,
            onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery = {
    val base = docs.writeStream.outputMode("append")
    checkpointLocation.foreach(base.option("checkpointLocation", _))
    base
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val withinDeduped =
            if (dedupWithinBatch)
              Dedup.dedupCorpus(batch, idCol, textCol, shingleN, bands,
                rows, minJaccard, maxBucket)
            else batch
          val survivors = loadIndex(spark, dir) match {
            case None => withinDeduped
            case Some(idx) =>
              val dupIds = Dedup.lshPairsAgainstIndex(withinDeduped, idx,
                  idCol, textCol, shingleN, bands, rows, minJaccard,
                  maxBucket)
                // a replayed batch meets its own first-attempt rows in
                // the index: identical ids are the replay artifact, not
                // a duplicate — see the idempotence contract above
                .where(col("a") =!= col("b"))
                .select(col("a").as(idCol)).distinct()
              withinDeduped.join(dupIds, Seq(idCol), "left_anti")
          }
          // one materialization feeds three writes (the dedup chain is
          // nontrivial; recomputing it per action would triple the batch)
          val s = survivors.persist()
          try {
            val n = s.count()
            s.write.mode("overwrite")
              .parquet(s"$dir/survivors/batch=$batchId")
            writeIndexShard(s, idCol, textCol, dir, batchId,
              shingleN, bands, rows)
            onBatch(batchId, n)
          } finally { s.unpersist(); () }
        }
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Accepted documents across all batches (plus nothing else — seeds
    * stay wherever the seed corpus lives). */
  def survivors(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/survivors").drop("batch")

  private def writeIndexShard(docs: DataFrame, idCol: String,
                              textCol: String, dir: String, batchId: Long,
                              shingleN: Int, bands: Int, rows: Int): Unit = {
    val idx = Dedup.lshIndex(docs, idCol, textCol, shingleN, bands, rows)
    idx.banded.write.mode("overwrite")
      .parquet(s"$dir/index/banded/batch=$batchId")
    idx.shingles.write.mode("overwrite")
      .parquet(s"$dir/index/shingled/batch=$batchId")
  }

  private def loadIndex(spark: SparkSession,
                        dir: String): Option[Dedup.LshIndex] = {
    val banded = new org.apache.hadoop.fs.Path(s"$dir/index/banded")
    val fs = banded.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(banded)) None
    else Some(Dedup.LshIndex(
      spark.read.parquet(s"$dir/index/banded").drop("batch"),
      spark.read.parquet(s"$dir/index/shingled").drop("batch")))
  }
}
