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

  private def batchDirs(dir: String): Set[String] =
    Option(new java.io.File(s"$dir/index/banded").listFiles())
      .map(_.filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getName).toSet).getOrElse(Set.empty)
  private def baseDirs(dir: String): Set[String] =
    Option(new java.io.File(s"$dir/index").listFiles())
      .map(_.filter(f => f.isDirectory && f.getName.startsWith("base-"))
        .map(_.getName).toSet).getOrElse(Set.empty)

  test("foldAfterBatches: shard dirs fold behind the FOLDED pointer; the folded index still catches duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("dedupfold").toString
    graft.jobs.DedupIngestJob.seed(
      Seq((1L, lorem)).toDF("doc_id", "text"), "doc_id", "text", dir)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val folds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L),
      foldAfterBatches = 2,
      onFold = b => folds.synchronized { folds += b; () })
    try {
      // batch 0: seed(batch=-1) + batch=0 = 2 unfolded — within budget
      stream.addData((10L, other))
      q.processAllAvailable()
      assert(folds.synchronized(folds.isEmpty),
        "fold must not fire inside the batch budget")
      // batch 1: 3 unfolded > 2 — the loop folds everything into a base
      stream.addData((11L, "entirely novel text about wavelet trees and " +
        "succinct rank select dictionaries for compressed suffix arrays"))
      q.processAllAvailable()
      assert(folds.synchronized(folds.toSeq) == Seq(1L),
        "fold must fire past the batch budget")
      assert(batchDirs(dir).isEmpty,
        s"folded batch dirs must be swept: ${batchDirs(dir)}")
      assert(baseDirs(dir).size == 1,
        s"exactly one base generation must remain: ${baseDirs(dir)}")
      // batch 2: near-dups of the SEED and of both folded survivors must
      // still be caught — the folded base is the live index now
      stream.addData(
        (20L, lorem + " x"), (21L, other + " y"),
        (22L, "fresh unrelated prose describing tidal estuaries and the " +
          "migratory habits of arctic terns across two hemispheres"))
      q.processAllAvailable()
      val s = survivorIds(dir)
      assert(!s.contains(20L) && !s.contains(21L),
        s"folded index must still catch near-dups of folded survivors: $s")
      assert(s.contains(22L))
      assert(batchDirs(dir) == Set("batch=2"),
        s"post-fold batches append normally: ${batchDirs(dir)}")
    } finally q.stop()
  }

  test("per-batch shard writes are sized by row count, not the session partition setting") {
    val dir = java.nio.file.Files.createTempDirectory("dedupsized").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L))
    try {
      stream.addData((1L, lorem), (2L, other))
      q.processAllAvailable()
      // 2 docs: one file per component, not one per shuffle partition —
      // the accumulating-small-files term a year of micro-batches turns
      // into tens of thousands of near-empty files
      Seq(s"$dir/survivors/batch=0", s"$dir/index/banded/batch=0",
          s"$dir/index/shingled/batch=0").foreach { p =>
        val files = new java.io.File(p).listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1,
          s"$p must hold exactly one file for a 2-doc batch: ${files.length}")
      }
      assert(survivorIds(dir) == Set(1L, 2L))
    } finally q.stop()
  }

  test("crash between fold and checkpoint commit: replay ignores its own stale shard dirs") {
    val dir = java.nio.file.Files.createTempDirectory("dedupfoldcrash").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("dedupfoldcrash-ckpt").toString
    graft.jobs.DedupIngestJob.seed(
      Seq((1L, lorem)).toDF("doc_id", "text"), "doc_id", "text", dir)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // foldAfterBatches=1: the FIRST batch folds (seed + itself = 2 > 1),
    // and the injected crash lands after the fold's pointer flip but
    // before the checkpoint commits the batch — the torn window where a
    // replay re-creates batch dirs at or below the fold boundary
    val q1 = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckpt), foldAfterBatches = 1,
      onFold = _ => throw new RuntimeException("injected crash after fold"))
    stream.addData((10L, other), (11L, other + " y"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(err.getMessage.contains("injected crash"), err.getMessage)
    assert(batchDirs(dir).isEmpty, "the fold completed before the crash")
    val afterCrash = survivorIds(dir)
    assert(afterCrash.intersect(Set(10L, 11L)).size == 1)
    // restart: batch 0 REPLAYS — it re-dedups against the folded index
    // (which already holds its own survivor; the id guard excludes the
    // self-match) and re-creates batch=0 dirs that the effective view
    // must IGNORE (batch 0 <= fold boundary 0): counting them against
    // maxBucket would silently mask true duplicates
    val q2 = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckpt), foldAfterBatches = 1)
    try {
      q2.processAllAvailable()
      assert(survivorIds(dir) == afterCrash,
        "replay must reproduce the pre-crash survivors exactly")
      assert(batchDirs(dir) == Set("batch=0"),
        s"replay re-creates its shard dirs: ${batchDirs(dir)}")
      // the replayed stale dir is invisible: a near-dup of the folded
      // survivor is still caught, a fresh doc still lands
      stream.addData(
        (20L, other + " z"),
        (21L, "fresh unrelated prose describing tidal estuaries and the " +
          "migratory habits of arctic terns across two hemispheres"))
      q2.processAllAvailable()
      val s = survivorIds(dir)
      assert(!s.contains(20L),
        "the folded index must keep catching duplicates after a replay")
      assert(s.contains(21L))
      // one more batch pushes the unfolded count past the budget: the
      // next fold sweeps the stale replayed batch=0 along with batch=1/2
      stream.addData((30L, "a third stream of unrelated sentences about " +
        "glacier mass balance measurements and firn densification rates"))
      q2.processAllAvailable()
      assert(batchDirs(dir).isEmpty,
        s"the next fold must sweep the stale replayed dir: ${batchDirs(dir)}")
      assert(survivorIds(dir).contains(30L))
    } finally q2.stop()
  }
}
