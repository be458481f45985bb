package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Round-11: the incremental-dedup operator (d7) closed under a stream —
  * each micro-batch dedups against every prior survivor, survivors join
  * the index, and at-least-once replay across the torn window between
  * the batch's writes and the checkpoint commit is result-idempotent
  * (the same contract IvfStreamSpec pins for the ANN ingest loop). */
class DedupStreamSpec extends SparkSuite {
  import spark.implicits._

  private val lorem = "the quick brown fox jumps over the lazy dog while " +
    "seventy two jade finches argue about parquet partition pruning in " +
    "the late afternoon sun near the old harbor wall"
  private val other = "completely different content about distributed " +
    "query engines and shuffle partitioning strategies for massive " +
    "corpora with skewed key distributions and adaptive execution"

  private def survivorIds(dir: String): Set[Long] =
    graft.jobs.DedupIngestJob.survivors(spark, dir)
      .select("doc_id").as[Long].collect().toSet

  test("streamed dedup: batches dedup against seed + prior survivors; index grows") {
    val dir = java.nio.file.Files.createTempDirectory("dedupstream").toString
    val seed = Seq((1L, lorem)).toDF("doc_id", "text")
    graft.jobs.DedupIngestJob.seed(seed, "doc_id", "text", dir)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L),
      onBatch = (b, n) => batches.synchronized { batches += ((b, n)); () })
    try {
      // batch 0: a near-dup of the seed (drop), an intra-batch near-dup
      // pair (one survives), and a unique doc (survives)
      stream.addData(
        (10L, lorem + " x"),
        (11L, other), (12L, other + " y"),
        (13L, "entirely novel text about wavelet trees and succinct " +
          "rank select dictionaries for compressed suffix arrays"))
      q.processAllAvailable()
      val s1 = survivorIds(dir)
      assert(!s1.contains(10L), "near-dup of the seed must be dropped")
      assert(s1.contains(13L), "unique doc must survive")
      assert(s1.intersect(Set(11L, 12L)).size == 1,
        s"exactly one of the intra-batch near-dup pair survives: $s1")
      // batch 1: a near-dup of a BATCH-0 survivor (the index grew) and
      // one more unique doc
      stream.addData(
        (20L, "entirely novel text about wavelet trees and succinct " +
          "rank select dictionaries for compressed suffix arrays z"),
        (21L, "fresh unrelated prose describing tidal estuaries and the " +
          "migratory habits of arctic terns across two hemispheres"))
      q.processAllAvailable()
      val s2 = survivorIds(dir)
      assert(!s2.contains(20L),
        "near-dup of a prior batch's survivor must be dropped — the " +
          "index must grow with accepted docs")
      assert(s2.contains(21L))
      assert(batches.synchronized(batches.toSeq).map(_._1) == Seq(0L, 1L))
    } finally q.stop()
  }

  test("crash between batch writes and checkpoint commit: replay is result-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("dedupcrash").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dedupcrash-ckpt").toString
    graft.jobs.DedupIngestJob.seed(
      Seq((1L, lorem)).toDF("doc_id", "text"), "doc_id", "text", dir)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // attempt 1: crash AFTER the batch's three writes (survivors + index
    // shards on disk) but BEFORE foreachBatch returns — the checkpoint
    // never commits the batch
    val q1 = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckpt),
      onBatch = (_, _) =>
        throw new RuntimeException("injected crash after batch writes"))
    stream.addData((10L, lorem + " x"), (11L, other), (12L, other + " y"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(err.getMessage.contains("injected crash"), err.getMessage)
    val afterCrash = survivorIds(dir)
    assert(!afterCrash.contains(10L) &&
      afterCrash.intersect(Set(11L, 12L)).size == 1,
      s"first attempt's writes landed before the crash: $afterCrash")
    // restart from the checkpoint: the batch REPLAYS against an index
    // that already holds its own first-attempt survivors — the id guard
    // plus within-batch dedup make the outcome identical, and the
    // batch-keyed overwrites leave no duplicates
    val q2 = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckpt))
    try {
      q2.processAllAvailable()
      assert(survivorIds(dir) == afterCrash,
        "replay must reproduce the first attempt's survivors exactly")
      // no duplicate rows either — batch-keyed overwrite, not append
      val rows = graft.jobs.DedupIngestJob.survivors(spark, dir).count()
      assert(rows == afterCrash.size.toLong,
        s"replay duplicated survivor rows: $rows vs ${afterCrash.size}")
      // and the loop is live: a fresh batch still dedups and appends
      stream.addData((21L, "fresh unrelated prose describing tidal " +
        "estuaries and the migratory habits of arctic terns"))
      q2.processAllAvailable()
      assert(survivorIds(dir).contains(21L))
    } finally q2.stop()
  }
}
