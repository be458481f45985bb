package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Ann, Dedup}

/** Pins the caller-owned-cache contract (VERDICT r2 #2): every persist an
  * operator creates internally is released before it returns, and the ONLY
  * cache entry that may outlive the call is the returned handle (or the
  * `Staged.release` hook). Observed through `sc.getPersistentRDDs` — a
  * Dataset persist registers its column-buffer RDD there, and unpersist
  * removes it synchronously from the map. */
class CacheContractSpec extends SparkSuite {
  import spark.implicits._

  private def persisted: Int = spark.sparkContext.getPersistentRDDs.size

  private def freshDocs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumped over the lazy dogs"),
    (4L, "completely different content about spark engines"),
    (5L, "spark engines process completely different content"),
    (6L, "the  quick   brown fox jumps over the lazy dog  ")
  ).toDF("doc_id", "text")

  private def freshVecs: DataFrame = (0 until 40).map { i =>
    (i.toLong, Array.tabulate(8)(j => math.sin(i * 7 + j).toFloat))
  }.toDF("id", "emb")

  test("minHashLsh retains exactly the returned handle; unpersist clears it") {
    spark.catalog.clearCache()
    assert(persisted == 0)
    val pairs = Dedup.minHashLsh(freshDocs, "doc_id", "text",
      shingleN = 3, bands = 16, rows = 4, minJaccard = 0.7)
    pairs.collect()
    assert(persisted == 1, "only the caller-owned result may stay cached")
    pairs.unpersist(blocking = true)
    assert(persisted == 0)
  }

  test("resolveClusters retains exactly the returned handle") {
    spark.catalog.clearCache()
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val labels = Dedup.resolveClusters(pairs)
    labels.collect()
    assert(persisted == 1)
    labels.unpersist(blocking = true)
    assert(persisted == 0)
  }

  test("dedupCorpus small-graph path retains no cache at all") {
    spark.catalog.clearCache()
    val kept = Dedup.dedupCorpus(freshDocs, "doc_id", "text", minJaccard = 0.7)
    kept.collect()
    assert(persisted == 0,
      "small-graph path resolves driver-side; nothing may stay cached")
  }

  test("dedupCorpusStaged distributed path releases via the hook") {
    spark.catalog.clearCache()
    // threshold 0 forces the distributed label-propagation path
    val staged = Dedup.dedupCorpusStaged(freshDocs, "doc_id", "text",
      minJaccard = 0.7, smallGraphThreshold = 0)
    staged.df.collect()
    assert(persisted == 1,
      "distributed path may retain only the slim duplicate-id frame")
    staged.release()
    assert(persisted == 0)
  }

  test("lshTopK retains exactly the returned handle") {
    spark.catalog.clearCache()
    val nn = Ann.lshTopK(freshVecs, "id", "emb", k = 3, dim = 8)
    nn.collect()
    assert(persisted == 1)
    nn.unpersist(blocking = true)
    assert(persisted == 0)
  }

  test("ivfTopK retains exactly the returned handle") {
    spark.catalog.clearCache()
    val nn = Ann.ivfTopK(freshVecs, "id", "emb", k = 3, nCentroids = 4)
    nn.collect()
    assert(persisted == 1)
    nn.unpersist(blocking = true)
    assert(persisted == 0)
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
