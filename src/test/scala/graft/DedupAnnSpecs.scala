package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup}

/** Scale-path operators validated against their exact counterparts — the
  * hash-based paths (MinHash-LSH, SimHash, LSH/IVF ANN) have no SQL oracle,
  * so their contract is: candidates are a subset of the exact answer's
  * support, with usable recall on the fixture corpus. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),        // exact dup of 1
    (3L, "the quick brown fox jumped over the lazy dogs"),      // near dup
    (4L, "completely different content about spark engines"),
    (5L, "spark engines process completely different content"), // shares tokens w/ 4
    (6L, "the  quick   brown fox jumps over the lazy dog  ")    // ws-dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per squeezed content") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))   // 2 and 6 collapse into 1
  }

  test("ngram jaccard finds the near-dup pair and orders a<b") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        minJaccard = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(1L, 4L) })
  }

  test("minhash-LSH candidates reproduce the exact >=0.7 jaccard pairs here") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rows = 4, minJaccard = 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // verification step guarantees precision; banding gives recall on
    // high-jaccard pairs (16 bands x 4 rows ⇒ ~s-curve threshold 0.5)
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty && lsh == exact)
  }

  test("query-vs-corpus jaccard reaches corpus docs with SMALLER ids") {
    // doc 6 (whitespace-dup of 1) as the sole query must still find doc 1
    val got = Dedup.ngramJaccardForQueries(docs, "doc_id", "text",
        n = 3, queryPred = col("id") === 6, minJaccard = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((6L, 1L)), s"missed smaller-id near-dup: $got")
  }

  test("resolveClusters: transitive near-dups collapse to the min id") {
    // chain 1-2, 2-3 plus isolated pair 7-9 → clusters {1,2,3} and {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val got = Dedup.resolveClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(7L) == 7L && got(9L) == 7L)
  }

  test("dedupCorpus: end-to-end removal keeps one representative per cluster") {
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.7)
      .select("doc_id").as[Long].collect().toSet
    // 1,2,6 are (near-)identical → only 1 survives; 3 is a near-dup of 1
    // at ~0.77 jaccard → also collapsed; 4 and 5 survive
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(6L))
    assert(kept.contains(4L) && kept.contains(5L))
  }

  test("semantic dedup: co-clustered near-identical vectors collapse to min id") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.001f, 0.0f, 0.0f)),   // near-dup of 1
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f)),       // exact dup of 1
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (6L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 3, tau = 0.95, seed = 7L)
      .select("vec_id").as[Long].collect().toSet
    // identical/near-identical vectors always co-cluster → 2 and 3 must
    // collapse into 1; orthogonal vectors are never within tau
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L),
      s"got $kept")
    assert(Set(4L, 5L, 6L).subsetOf(kept), s"got $kept")
  }

  test("substring-gram dedup: catches spans that straddle chunk boundaries") {
    val words = (1 to 20).map(i => s"w$i")
    val corpus = Seq(
      (1L, words.mkString(" ")),
      // embeds w5..w12 (8 tokens, straddling any fixed 10-token chunk
      // boundary of doc 1) inside otherwise-unique text
      (2L, ("x1 x2 x3 " + words.slice(4, 12).mkString(" ") + " x4 x5")),
      (3L, "entirely unrelated content that shares no long span at all"),
      (4L, "too short to carry")                        // < 8 tokens
    ).toDF("doc_id", "text")
    val kept = Dedup.substringGramSurvivors(corpus, "doc_id", "text", k = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L), s"got $kept")
    // the canonical copy (smallest id) always survives
    assert(kept.contains(1L))
    // hashed path: identical survivor set
    val keptH = Dedup.substringGramSurvivors(corpus, "doc_id", "text",
        k = 8, hashed = true)
      .select("doc_id").as[Long].collect().toSet
    assert(keptH == kept)
    // disjoint 10-token chunking misses the straddling span: chunkDedup
    // keeps every chunk of doc 2 (no 10-token chunk of 2 equals one of 1)
    val chunkKept = Dedup.chunkDedup(corpus, "doc_id", "text", 10)
      .where(col("id") === 2L).select("n_chunks", "n_kept")
      .as[(Long, Long)].head()
    assert(chunkKept._1 == chunkKept._2,
      "expected chunk dedup to MISS the straddling span (motivates d12)")
  }

  test("simhash: identical docs at hamming 0, unrelated docs blocked or far") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs((1L, 6L)) == 0L)   // whitespace squeezed before hashing
    assert(!pairs.contains((1L, 4L)))
  }

  test("simhash fnv variant: single-token signature IS the token's FNV-1a-64") {
    // one token → every bit votes exactly once, so the signature equals the
    // token hash wherever its bit is 1 (ties at 0 votes stay 0 — there are
    // none with a single vote). Hand-computed: fnv1a64("key") over code
    // points = 0x3dc84e93...: h=0xcbf29ce484222325; h=(h^cp)*0x100000001b3
    // for cp in 107,101,121 → 4452171178779021548.
    val sig = Seq("key").toDF("t")
      .select(Dedup.simHash(col("t"), fnv = true)).as[Long].head()
    assert(sig == 4452171178779021548L)
    // and the fnv flag actually changes the hash family
    val xx = Seq("key").toDF("t")
      .select(Dedup.simHash(col("t"))).as[Long].head()
    assert(xx != sig)
  }
}

class AnnSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("LSH ANN: reported cosines are correct and recall@5 is usable") {
    val brute = Ann.bruteForceTopK(emb.where(col("vec_id") < 30), emb,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(emb, "vec_id", "embedding", k = 5,
        dim = 64, tables = 12, bits = 0, seed = 42L)
      .where(col("query_id") < 30)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"LSH recall@5 too low: $recall")
  }

  test("IVF ANN: probed-cell ranking finds most true neighbors") {
    val brute = Ann.bruteForceTopK(emb.where(col("vec_id") < 30), emb,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(emb, "vec_id", "embedding", k = 5,
        nCentroids = 8, nProbe = 4, seed = 42L)
      .where(col("query_id") < 30)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@5 too low: $recall")
  }
}
