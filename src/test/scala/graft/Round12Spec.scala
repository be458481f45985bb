package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Round-12 pins: the four r11 ADVICE hardening items (stray batch-dir
  * names, lost-FOLDED-pointer detection, lost-append fencing in post-flip
  * cleanup, unbuilt-dir fail-fast) and the r11 verdict-3 adversarial
  * concurrent-maintainer surface (fenced pointer flips — detection, not
  * locking). */
class Round12Spec extends SparkSuite {
  import spark.implicits._

  private val lorem = "the quick brown fox jumps over the lazy dog while " +
    "seventy two jade finches argue about parquet partition pruning in " +
    "the late afternoon sun near the old harbor wall"
  private val other = "completely different content about distributed " +
    "query engines and shuffle partitioning strategies for massive " +
    "corpora with skewed key distributions and adaptive execution"

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- advice 1
  test("a stray near-protocol dir (batch=3.bak) under the dedup index is ignored, not a stream-killing NumberFormatException") {
    val dir = java.nio.file.Files.createTempDirectory("dedupstray").toString
    graft.jobs.DedupIngestJob.seed(
      Seq((1L, lorem)).toDF("doc_id", "text"), "doc_id", "text", dir)
    // the stray: an editor/operator backup beside the real shard dirs —
    // matched by a bare startsWith+stripPrefix parse, rejected by the
    // anchored one
    val stray = new java.io.File(s"$dir/index/banded/batch=3.bak")
    assert(stray.mkdirs())
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L), foldAfterBatches = 1)
    try {
      // two batches so the fold budget (1) trips and BOTH listings run —
      // the unfolded count probe and the fold's cleanup walk
      stream.addData((10L, other))
      q.processAllAvailable()
      stream.addData((11L, "entirely novel text about wavelet trees and " +
        "succinct rank select dictionaries for compressed suffix arrays"))
      q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"stray dir must not kill the stream: ${q.exception}")
      val ids = graft.jobs.DedupIngestJob.survivors(spark, dir)
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(10L, 11L))
      // not protocol state → not ours to delete: the fold leaves it alone
      assert(stray.isDirectory, "fold cleanup must not delete a stray dir")
    } finally q.stop()
  }

  // ---------------------------------------------------------------- advice 2
  test("a lost FOLDED pointer with a folded base on disk fails the stream loudly instead of silently forgetting folded history") {
    val dir = java.nio.file.Files.createTempDirectory("dedupnoptr").toString
    graft.jobs.DedupIngestJob.seed(
      Seq((1L, lorem)).toDF("doc_id", "text"), "doc_id", "text", dir)
    implicit val sqlCtx = spark.sqlContext
    val stream1 = MemoryStream[(Long, String)]
    val q1 = graft.jobs.DedupIngestJob.start(
      stream1.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L), foldAfterBatches = 1)
    try {
      stream1.addData((10L, other))
      q1.processAllAvailable()
      stream1.addData((11L, "entirely novel text about wavelet trees and " +
        "succinct rank select dictionaries for compressed suffix arrays"))
      q1.processAllAvailable()
    } finally q1.stop()
    // the fold ran: a base-* generation exists behind the FOLDED pointer
    val idx = new java.io.File(s"$dir/index")
    assert(idx.listFiles().exists(_.getName.startsWith("base-")),
      "fixture must have folded")
    // the failure mode: pointer lost (manual deletion / partial restore),
    // base generation still on disk — AND a replay leftover: a checkpoint
    // replay re-created ONE of the folded batch dirs. Subset presence
    // must NOT read as "crashed fold" (which requires ALL source dirs) —
    // the r12 review's counterexample to a boundary-only marker
    assert(new java.io.File(s"$dir/index/banded/batch=0").mkdirs() ||
      new java.io.File(s"$dir/index/banded/batch=0").isDirectory)
    assert(new java.io.File(idx, "FOLDED").delete())
    new java.io.File(idx, ".FOLDED.old").delete()
    val stream2 = MemoryStream[(Long, String)]
    val q2 = graft.jobs.DedupIngestJob.start(
      stream2.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L))
    // a batch that IS a near-dup of folded history — without the check it
    // would sail through as a "survivor"
    stream2.addData((20L, lorem + " x"))
    val err = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(err.getMessage.contains("no FOLDED pointer"), err.getMessage)
  }

  test("a crashed first fold's orphan base self-heals: the stream proceeds on the intact batch dirs and the next fold sweeps it") {
    // the review counterpart of the lost-pointer check: a fold that died
    // BEFORE its flip (orphan base on disk, pointer never written, every
    // source batch dir intact) is a crash window the at-least-once design
    // supports — it must NOT be read as a lost pointer and kill the
    // stream; deduping against the batch dirs alone is complete there
    val dir = java.nio.file.Files.createTempDirectory("dedupfoldcr2").toString
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
    // the crashed fold: base components written, source-id marker
    // written, flip never happened — seed (-1) and batch 0 dirs, the
    // fold's full source set, are all intact
    val orphan = new java.io.File(s"$dir/index/base-00000000-dead-beef")
    assert(new java.io.File(orphan, "banded").mkdirs())
    assert(new java.io.File(orphan, "shingled").mkdirs())
    java.nio.file.Files.writeString(
      orphan.toPath.resolve("_FOLDED_UPTO"), "-1,0")
    val folds = new java.util.concurrent.atomic.AtomicInteger
    val stream2 = MemoryStream[(Long, String)]
    val q2 = graft.jobs.DedupIngestJob.start(
      stream2.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L), foldAfterBatches = 1,
      onFold = _ => { folds.incrementAndGet(); () })
    try {
      // a near-dup of the batch-0 survivor: the (batch-dir) index must
      // still catch it — nothing folded was forgotten, nothing crashed
      stream2.addData((20L, other + " y"), (21L, "entirely novel text " +
        "about wavelet trees and succinct rank select dictionaries"))
      q2.processAllAvailable()
      stream2.addData((30L, "fresh unrelated prose describing tidal " +
        "estuaries and the migratory habits of arctic terns"))
      q2.processAllAvailable()
      assert(q2.exception.isEmpty,
        s"crashed-fold orphan must not kill the stream: ${q2.exception}")
      val ids = graft.jobs.DedupIngestJob.survivors(spark, dir)
        .select("doc_id").as[Long].collect().toSet
      assert(!ids.contains(20L), "dedup against batch dirs must still work")
      assert(ids.contains(21L) && ids.contains(30L))
      assert(folds.get() >= 1, "the in-loop fold must have fired")
      assert(!orphan.exists(),
        "the next successful fold must sweep the crashed fold's orphan")
      assert(new java.io.File(s"$dir/index/FOLDED").isFile)
    } finally q2.stop()
  }

  // ---------------------------------------------------------------- advice 3
  test("sweep refuses to delete a superseded generation holding a shard committed after the fold snapshot (lost-append fence)") {
    val dir = java.nio.file.Files.createTempDirectory("ivflost").toString
    graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 400),
      "vec_id", "embedding", dir, nCentroids = 4, seed = 42L)
    assert(graft.operators.Ann.appendIvfShard(
      emb.where(col("vec_id") >= 400 && col("vec_id") < 450),
      "vec_id", "embedding", dir) == 1)
    val oldGenDir = new java.io.File(
      graft.operators.Ann.resolveIvfDir(spark, dir))
    val oldBuildId = oldGenDir.getName.stripPrefix("gen-")
    // compact folds shards {0, 1} and retains the superseded generation
    assert(graft.operators.Ann.compactIvfIndex(
      spark, dir, retainSuperseded = true) == 450L)
    // the breach: an append commits shard 2 into the SUPERSEDED
    // generation after the fold snapshot (a second maintainer/appender
    // violating single-writer) — its rows are in no live generation
    val marker = new java.io.File(oldGenDir,
      s"postings.parquet/_SHARD_COMMIT_${oldBuildId}_2")
    assert(marker.createNewFile())
    val e = intercept[IllegalStateException] {
      graft.operators.Ann.sweepIvfIndex(spark, dir)
    }
    assert(e.getMessage.contains("raced the maintenance flip"), e.getMessage)
    assert(oldGenDir.isDirectory,
      "the fence must leave the evidence on disk")
    // operator resolves the breach (re-appends from source), clears the
    // foreign marker — the sweep then completes
    assert(marker.delete())
    val swept = graft.operators.Ann.sweepIvfIndex(spark, dir)
    assert(swept.contains(oldGenDir.getName), swept.toString)
    assert(!oldGenDir.exists())
  }

  // ---------------------------------------------------------------- advice 4
  test("resolveIvfDir fails fast on a missing or unbuilt dir — the retry budget is reserved for the flip window") {
    val missing = "/tmp/graft-definitely-not-an-index-" +
      java.util.UUID.randomUUID()
    val t0 = System.nanoTime()
    val e1 = intercept[IllegalStateException] {
      graft.operators.Ann.resolveIvfDir(spark, missing)
    }
    val msMissing = (System.nanoTime() - t0) / 1e6
    assert(e1.getMessage.contains("does not exist"), e1.getMessage)
    val empty = java.nio.file.Files.createTempDirectory("ivfempty").toString
    val t1 = System.nanoTime()
    val e2 = intercept[IllegalStateException] {
      graft.operators.Ann.resolveIvfDir(spark, empty)
    }
    val msEmpty = (System.nanoTime() - t1) / 1e6
    assert(e2.getMessage.contains("no index artifacts"), e2.getMessage)
    // fail-FAST: nowhere near the 20×5 ms retry budget (generous bound —
    // the point is no deliberate sleep, not a micro-benchmark)
    assert(msMissing < 80 && msEmpty < 80,
      f"unbuilt-dir probe must not spin the retry budget: " +
        f"$msMissing%.0f ms / $msEmpty%.0f ms")
    // and a REAL index still resolves (the probe must not misfire on a
    // healthy layout)
    val dir = java.nio.file.Files.createTempDirectory("ivfok").toString
    graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 100),
      "vec_id", "embedding", dir, nCentroids = 2, seed = 42L)
    assert(graft.operators.Ann.resolveIvfDir(spark, dir).contains("gen-"))
  }

  // -------------------------------------------------------------- verdict 3
  test("verifyOwn detects a foreign flip: the losing maintainer fails loudly, never reports its generation installed") {
    val dir = java.nio.file.Files.createTempDirectory("ptrfence").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    graft.io.AtomicPointer.flipFenced(fs, conf, dir, "CURRENT", "gen-mine")
    // a rogue second maintainer lands its flip between my flip and my
    // (later, end-of-maintenance) verify
    graft.io.AtomicPointer.flip(fs, conf, dir, "CURRENT", "gen-rogue")
    val e = intercept[graft.io.AtomicPointer.ConcurrentFlipException] {
      graft.io.AtomicPointer.verifyOwn(fs, dir, "CURRENT", "gen-mine")
    }
    assert(e.getMessage.contains("gen-rogue") &&
      e.getMessage.contains("single-writer"), e.getMessage)
    // the rogue's own fence passes — IT is the installed generation
    graft.io.AtomicPointer.verifyOwn(fs, dir, "CURRENT", "gen-rogue")
  }

  /** RawLocalFileSystem under a scheme with no AbstractFileSystem binding:
    * FileContext.getFileContext throws UnsupportedFileSystemException, so
    * AtomicPointer.flip takes its RECOVERABLE NON-ATOMIC fallback — the
    * path where concurrent flips can actually interleave. */
  private def noAfsFs(): org.apache.hadoop.fs.FileSystem = {
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def getUri: java.net.URI =
        java.net.URI.create("graftnoafs:///")
    }
    fs.initialize(java.net.URI.create("graftnoafs:///"),
      spark.sparkContext.hadoopConfiguration)
    fs
  }

  test("concurrent fenced flips on the non-atomic fallback path: every flip either installs verified or fails loudly; the final pointer is never torn") {
    val dir = java.nio.file.Files.createTempDirectory("ptrrace").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = noAfsFs()
    graft.io.AtomicPointer.flipFenced(fs, conf, dir, "PTR", "gen-init")
    val successes =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val unexpected =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 3).map { t =>
      val th = new Thread(() => {
        // each maintainer needs its OWN FileSystem handle — sharing one
        // is not part of the single-writer question under test
        val myFs = noAfsFs()
        start.await()
        (0 until 8).foreach { i =>
          val content = s"gen-t$t-$i"
          try {
            graft.io.AtomicPointer.flipFenced(myFs, conf, dir, "PTR",
              content)
            successes.add(content)
          } catch {
            // loud losses are the contract: the fence's detection, the
            // fallback's rename requires, or an IO race — all of them
            // REPORT the failed install instead of lying
            case _: graft.io.AtomicPointer.ConcurrentFlipException => ()
            case _: IllegalArgumentException => ()
            case _: java.io.IOException => ()
            case e: Throwable => unexpected.compareAndSet(null, e)
          }
        }
      }, s"ptr-race-$t")
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join(60000))
    assert(unexpected.get() == null, s"silent/unknown failure: " +
      s"${unexpected.get()}")
    assert(!successes.isEmpty, "under 24 attempts some flips must land")
    // The invariant under deliberate breach: the pointer always resolves
    // to SOME content a flip actually wrote — never torn garbage, never
    // missing — and every maintainer whose install was lost was TOLD
    // (the loud-outcome check above). "Final ∈ verified winners" is
    // deliberately NOT asserted: a loudly-FAILED later flip can leave
    // its aside snapshot (an older superseded content) as the resolvable
    // pointer — that is the recoverable-fallback's single-writer crash
    // guarantee (one generation stays readable) doing its job while the
    // single-writer contract is being violated; the superseded owner
    // already received its ConcurrentFlipException, whose message says
    // exactly what to do (rerun maintenance serially). Caught live by
    // this hammer: final = gen-t2-7 via the aside after t2-7's verify
    // had (correctly) failed and a still-later flip died loudly mid-
    // sequence.
    val all = (0 until 3).flatMap(t => (0 until 8).map(i => s"gen-t$t-$i"))
      .toSet + "gen-init"
    val finalPtr = graft.io.AtomicPointer.read(fs, dir, "PTR")
    assert(finalPtr.exists(all), s"final pointer $finalPtr must be a " +
      "content some flip wrote — a torn or missing pointer is a silent " +
      "corruption readers would hit")
  }

  test("two concurrent compactions: serialized success or a loud error — never a silently wrong index") {
    val expect = {
      val dir0 = java.nio.file.Files.createTempDirectory("ivfc2e").toString
      graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 400),
        "vec_id", "embedding", dir0, nCentroids = 4, seed = 42L)
      servedRows(dir0)
    }
    (1 to 2).foreach { iter =>
      val dir = java.nio.file.Files.createTempDirectory("ivfc2").toString
      graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 400),
        "vec_id", "embedding", dir, nCentroids = 4, seed = 42L)
      val outcomes = (0 until 2).map { _ =>
        new java.util.concurrent.atomic.AtomicReference[
          scala.util.Try[Long]]()
      }
      val threads = outcomes.map { slot =>
        val th = new Thread(() => slot.set(scala.util.Try(
          graft.operators.Ann.compactIvfIndex(spark, dir))))
        th.start(); th
      }
      threads.foreach(_.join(120000))
      val results = outcomes.map(_.get())
      assert(results.forall(_ != null), s"[$iter] a compaction hung")
      // every loss must be LOUD; a success must mean a correct live index.
      // Both-succeed is fine (they fold identical content; the later flip
      // is simply the later maintenance) — what must never happen is a
      // silently wrong or missing answer after claimed success.
      val anySuccess = results.exists(_.isSuccess)
      val finalState = scala.util.Try(servedRows(dir))
      finalState match {
        case scala.util.Success(rows) =>
          assert(rows == expect,
            s"[$iter] index serves WRONG results after concurrent " +
              s"compaction: $results")
        case scala.util.Failure(_) =>
          // a torn final state is tolerable ONLY if no maintainer was
          // allowed to believe it installed cleanly without a fight
          assert(!anySuccess || results.exists(_.isFailure),
            s"[$iter] all compactions claimed clean success but the " +
              s"index is torn: $results / $finalState")
      }
      results.foreach {
        case scala.util.Failure(e) =>
          // the loud kinds: the flip fence, a cleanup/require, or a
          // Spark job dying on the racer's deleted files
          assert(e.isInstanceOf[IllegalStateException] ||
            e.isInstanceOf[IllegalArgumentException] ||
            e.isInstanceOf[org.apache.spark.SparkException] ||
            e.isInstanceOf[java.io.IOException],
            s"[$iter] unexpected failure kind: $e")
        case _ => ()
      }
    }
  }

  private def servedRows(dir: String): Set[(Long, Long)] =
    graft.operators.Ann.queryIvfIndex(
        emb.where(col("vec_id") < 10), "vec_id", "embedding", dir,
        k = 5, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
}
