package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Ann, Dedup}

/** Pins the caller-owned-cache contract (VERDICT r2 #2): every persist an
  * operator creates internally is released before it returns, and the ONLY
  * cache entry that may outlive the call is the returned handle (or the
  * `Staged.release` hook). Observed through `sc.getPersistentRDDs` — a
  * Dataset persist registers its column-buffer RDD there, and unpersist
  * removes it synchronously from the map.
  *
  * Counted as a DELTA against a pre-call snapshot of RDD ids, not as an
  * absolute size: suites share one SparkContext and run in parallel under
  * sbt, so another suite's persists (e.g. an ALS fit's factor RDDs) may
  * coexist — they have higher ids than the snapshot only if created during
  * the window, and operator persists are the only Dataset persists these
  * fixtures trigger. */
class CacheContractSpec extends SparkSuite {
  import spark.implicits._

  private def ids: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Run `op`, assert it retained exactly `retained` NEW persisted RDDs,
    * release via `release`, assert all of ours are gone. Re-snapshots
    * around the call so concurrent suites' persists cancel out unless they
    * land inside the call window (in which case their entries would also
    * have to survive `release` to false-fail — they are short-lived). */
  private def checkRetention[A](retained: Int)(op: => A)(release: A => Unit): Unit = {
    val before = ids
    val out = op
    val mine = ids.diff(before)
    assert(mine.size == retained,
      s"expected $retained retained cache entr(y/ies), got ${mine.size}")
    release(out)
    assert(ids.diff(before).isEmpty, "release must drop every retained entry")
  }

  // Fixtures are UNIQUE to this suite (the "ccspec" marker): CacheManager
  // dedupes persists by analyzed plan, so if a concurrently-running suite
  // had already cached an identical fixture+operator plan, this suite's
  // persist would register NO new entry and the retention count would read
  // 0 — a plan-collision flake, not a contract violation.
  private def freshDocs: DataFrame = Seq(
    (1L, "ccspec the quick brown fox jumps over the lazy dog"),
    (2L, "ccspec the quick brown fox jumps over the lazy dog"),
    (3L, "ccspec the quick brown fox jumped over the lazy dogs"),
    (4L, "ccspec completely different content about spark engines"),
    (5L, "ccspec spark engines process completely different content"),
    (6L, "ccspec the  quick   brown fox jumps over the lazy dog  ")
  ).toDF("doc_id", "text")

  private def freshVecs: DataFrame = (0 until 40).map { i =>
    (i.toLong, Array.tabulate(8)(j => math.sin(i * 13 + j + 0.5).toFloat))
  }.toDF("id", "emb")

  test("minHashLsh retains exactly the returned handle; unpersist clears it") {
    checkRetention(1) {
      val pairs = Dedup.minHashLsh(freshDocs, "doc_id", "text",
        shingleN = 3, bands = 16, rows = 4, minJaccard = 0.7)
      pairs.collect()
      pairs
    }(_.unpersist(blocking = true))
  }

  test("resolveClusters retains exactly the returned handle") {
    checkRetention(1) {
      val labels = Dedup.resolveClusters(
        Seq((101L, 202L), (202L, 303L), (707L, 909L)).toDF("a", "b"))
      labels.collect()
      labels
    }(_.unpersist(blocking = true))
  }

  test("dedupCorpus small-graph path retains no cache at all") {
    checkRetention(0) {
      Dedup.dedupCorpus(freshDocs, "doc_id", "text", minJaccard = 0.7).collect()
    }(_ => ())
  }

  test("dedupCorpusStaged distributed path releases via the hook") {
    checkRetention(1) {
      // threshold 0 forces the distributed label-propagation path
      val staged = Dedup.dedupCorpusStaged(freshDocs, "doc_id", "text",
        minJaccard = 0.7, smallGraphThreshold = 0)
      staged.df.collect()
      staged
    }(_.release())
  }

  test("lshTopK retains exactly the returned handle") {
    checkRetention(1) {
      val nn = Ann.lshTopK(freshVecs, "id", "emb", k = 3, dim = 8)
      nn.collect()
      nn
    }(_.unpersist(blocking = true))
  }

  test("ivfTopK retains exactly the returned handle") {
    checkRetention(1) {
      val nn = Ann.ivfTopK(freshVecs, "id", "emb", k = 3, nCentroids = 4)
      nn.collect()
      nn
    }(_.unpersist(blocking = true))
  }

  test("suffix pass retains exactly the final round's checkpoint; release clears it") {
    // the r10 warm-JVM OOM investigation's standing guard (r11): every
    // per-round localCheckpoint the doubling loop creates must be released
    // by the time the NEXT round's checkpoint exists, and the one the
    // returned frame reads must go with the Staged hook — a regression
    // here is exactly the cross-run accumulator the rehearsal OOM implied
    checkRetention(1) {
      val staged = graft.operators.SuffixDedup.duplicatedRegionsStaged(
        freshDocs, "doc_id", "text", minLength = 8)
      staged.df.collect()
      staged
    }(_.release())
  }

  test("dedupCorpus distributed and small-graph paths agree on survivors") {
    val viaDriver = Dedup.dedupCorpus(freshDocs, "doc_id", "text",
        minJaccard = 0.7)
      .select("doc_id").as[Long].collect().toSet
    val staged = Dedup.dedupCorpusStaged(freshDocs, "doc_id", "text",
      minJaccard = 0.7, smallGraphThreshold = 0)
    val viaCluster = staged.df.select("doc_id").as[Long].collect().toSet
    staged.release()
    assert(viaDriver == viaCluster)
  }
}
