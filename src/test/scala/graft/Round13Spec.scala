package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Round-13 pins: the r12 ADVICE pointer-fence hardening (verifyOwn reads
  * the primary ONLY — the aside-fallback false pass), the breach-residue
  * aside cleanup (r12 verdict 6), and the fold marker-first reordering
  * (a crash ANYWHERE mid-fold now leaves a discriminable crashed orphan,
  * including the window before the component writes). */
class Round13Spec extends SparkSuite {
  import spark.implicits._

  private val lorem = "the quick brown fox jumps over the lazy dog while " +
    "seventy two jade finches argue about parquet partition pruning in " +
    "the late afternoon sun near the old harbor wall"
  private val other = "completely different content about distributed " +
    "query engines and shuffle partitioning strategies for massive " +
    "corpora with skewed key distributions and adaptive execution"

  /** RawLocalFileSystem under a scheme with no AbstractFileSystem binding:
    * flips take the RECOVERABLE NON-ATOMIC fallback — the path where
    * concurrent flips can actually interleave. */
  private def noAfsFs(): org.apache.hadoop.fs.FileSystem = {
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def getUri: java.net.URI =
        java.net.URI.create("graftnoafs:///")
    }
    fs.initialize(java.net.URI.create("graftnoafs:///"),
      spark.sparkContext.hadoopConfiguration)
    fs
  }

  // --------------------------------------------------------- r12 advice 1
  test("verifyOwn does not false-pass through the aside: a foreign flip caught mid-sequence (our primary renamed aside) raises, not verifies") {
    val dir = java.nio.file.Files.createTempDirectory("ptrmidflip").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = noAfsFs()
    graft.io.AtomicPointer.flipFenced(fs, conf, dir, "PTR", "gen-mine")
    // the foreign flip's FIRST rename on the non-atomic path: our primary
    // moves aside; the foreign primary is not installed yet. The old
    // read()-based fence resolved the aside, read its own content back,
    // and PASSED — both maintainers then believed they were installed.
    val p = new org.apache.hadoop.fs.Path(s"$dir/PTR")
    val aside = new org.apache.hadoop.fs.Path(s"$dir/.PTR.old")
    if (fs.exists(aside)) fs.delete(aside, false)
    assert(fs.rename(p, aside), "fixture: primary -> aside")
    val e = intercept[graft.io.AtomicPointer.ConcurrentFlipException] {
      graft.io.AtomicPointer.verifyOwn(fs, dir, "PTR", "gen-mine")
    }
    assert(e.getMessage.contains("<missing>"), e.getMessage)
    // the aside (the sole resolvable pointer in this crash-recovery-like
    // state) is NOT cleared — readers must still resolve a generation
    assert(fs.exists(aside),
      "verifyOwn must not delete the aside while the primary is missing")
  }

  // -------------------------------------------------------- r12 verdict 6
  test("breach residue: the losing maintainer's stale aside is cleared when its fence reads a verified foreign primary") {
    val dir = java.nio.file.Files.createTempDirectory("ptrresidue").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = noAfsFs()
    // the detected-breach end-state the r12 spec pinned: the winner's
    // primary is installed; the loser's failed flip left an aside
    // holding SUPERSEDED content that read() would resolve if the
    // primary were ever lost
    graft.io.AtomicPointer.flip(fs, conf, dir, "PTR", "gen-winner")
    graft.io.AtomicPointer.writeSmall(fs,
      new org.apache.hadoop.fs.Path(s"$dir/.PTR.old"), "gen-superseded")
    val e = intercept[graft.io.AtomicPointer.ConcurrentFlipException] {
      graft.io.AtomicPointer.verifyOwn(fs, dir, "PTR", "gen-loser")
    }
    assert(e.getMessage.contains("gen-winner"), e.getMessage)
    // the loser cleaned its residue on the way out: only the winner's
    // primary remains resolvable
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.PTR.old")),
      "the stale aside must be cleared while the foreign primary exists")
    assert(graft.io.AtomicPointer.read(fs, dir, "PTR")
      .contains("gen-winner"))
  }

  // --------------------------------------------------------- r12 advice 2
  test("a fold crashed BEFORE its component writes (marker-only orphan base) self-heals: the stream proceeds and the next fold sweeps it") {
    // the window the marker-first reordering makes discriminable: srcIds
    // marker written, parquet components never started. Previously this
    // orphan was marker-less -> classified as a lost pointer -> every
    // restart failed loudly until an operator hand-deleted the base.
    val dir = java.nio.file.Files.createTempDirectory("foldmarker1st").toString
    graft.jobs.DedupIngestJob.seed(
      Seq((1L, lorem)).toDF("doc_id", "text"), "doc_id", "text", dir)
    implicit val sqlCtx = spark.sqlContext
    val stream1 = MemoryStream[(Long, String)]
    val q1 = graft.jobs.DedupIngestJob.start(
      stream1.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L))
    try {
      stream1.addData((10L, other))
      q1.processAllAvailable()
    } finally q1.stop()
    // the crashed fold: marker only — no banded/, no shingled/
    val orphan = new java.io.File(s"$dir/index/base-00000000-mark-only")
    assert(orphan.mkdirs())
    java.nio.file.Files.writeString(
      orphan.toPath.resolve("_FOLDED_UPTO"), "-1,0")
    val folds = new java.util.concurrent.atomic.AtomicInteger
    val stream2 = MemoryStream[(Long, String)]
    val q2 = graft.jobs.DedupIngestJob.start(
      stream2.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L), foldAfterBatches = 1,
      onFold = _ => { folds.incrementAndGet(); () })
    try {
      // a near-dup of the batch-0 survivor: the batch-dir index view is
      // complete (nothing was deleted pre-commit), so it must be caught
      stream2.addData((20L, other + " y"), (21L, "entirely novel text " +
        "about wavelet trees and succinct rank select dictionaries"))
      q2.processAllAvailable()
      stream2.addData((30L, "fresh unrelated prose describing tidal " +
        "estuaries and the migratory habits of arctic terns"))
      q2.processAllAvailable()
      assert(q2.exception.isEmpty,
        s"marker-only orphan must not kill the stream: ${q2.exception}")
      val ids = graft.jobs.DedupIngestJob.survivors(spark, dir)
        .select("doc_id").as[Long].collect().toSet
      assert(!ids.contains(20L), "dedup against batch dirs must still work")
      assert(ids.contains(21L) && ids.contains(30L))
      assert(folds.get() >= 1, "the in-loop fold must have fired")
      assert(!orphan.exists(),
        "the next successful fold must sweep the marker-only orphan")
    } finally q2.stop()
  }
}
