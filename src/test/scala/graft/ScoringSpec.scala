package graft

import org.apache.spark.sql.functions._
import graft.rank.Scoring

/** Hand-computed expectations for cluster-local cosine scoring (J8/P5/W3). */
class ScoringSpec extends SparkSuite {
  import spark.implicits._

  test("J8: cluster-local cosine matches hand computation; cross-cluster pairs excluded") {
    // query 1 (cluster 0): [a a b]; corpus: u10 (c0) [a b], u11 (c0) [c],
    // u12 (c1) [a a b] — same tokens as the query but a different cluster,
    // so it must be excluded
    val queries = Seq((1L, 0, Seq("a", "a", "b"))).toDF("userId", "cluster", "tokens")
    val corpus = Seq(
      (10L, 0, Seq("a", "b")),
      (11L, 0, Seq("c")),
      (12L, 1, Seq("a", "a", "b"))
    ).toDF("userId", "cluster", "tokens")
    val sims = Scoring.clusterCosine(queries, corpus)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val expected = 3.0 / math.sqrt(10.0)   // (2*1 + 1*1) / (sqrt5 * sqrt2)
    assert(sims.keySet == Set((1L, 10L)))  // u11 shares no term, u12 wrong cluster
    assert(math.abs(sims((1L, 10L)) - expected) < 1e-12)
  }

  test("precomputed corpus postings give identical sims to the inline path") {
    // the serving index: termPostings(corpus) passed in must change COST
    // only, never a similarity value
    val queries = Seq((1L, 0, Seq("a", "a", "b")), (2L, 1, Seq("c", "d")))
      .toDF("userId", "cluster", "tokens")
    val corpus = Seq(
      (10L, 0, Seq("a", "b")), (11L, 0, Seq("b", "b", "c")),
      (12L, 1, Seq("c")), (13L, 1, Seq("d", "c"))
    ).toDF("userId", "cluster", "tokens")
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    for (vocab <- Seq(None, Some(Set("a", "b", "c", "d")), Some(Set("a", "c")))) {
      val inline = asMap(Scoring.clusterCosine(queries, corpus, vocab))
      val indexed = asMap(Scoring.clusterCosine(queries, corpus, vocab,
        corpusPostings = Some(Scoring.termPostings(corpus, vocab))))
      assert(indexed == inline, s"vocab=$vocab")
      assert(inline.nonEmpty)
    }
  }

  test("a postings index built with a DIFFERENT vocab fails loudly, not silently misaligned") {
    val queries = Seq((1L, 0, Seq("a", "b"))).toDF("userId", "cluster", "tokens")
    val corpus = Seq((10L, 0, Seq("a", "b"))).toDF("userId", "cluster", "tokens")
    // same SIZE, different terms: the per-term int indices collide
    // position-for-position, so only a fingerprint can catch it
    val stale = Scoring.termPostings(corpus, Some(Set("a", "c")))
    val e = intercept[Throwable] {
      Scoring.clusterCosine(queries, corpus, Some(Set("a", "b")),
        corpusPostings = Some(stale)).collect()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("DIFFERENT vocabulary"), msgs(e))
    // and an indexed postings frame without a query-side vocab is refused
    // up front (ints would join against raw strings)
    val e2 = intercept[IllegalArgumentException] {
      Scoring.clusterCosine(queries, corpus, None, corpusPostings = Some(stale))
    }
    assert(e2.getMessage.contains("term-indexed"), e2.getMessage)
  }

  test("null token arrays fall through to the no-sims fallback on the local lane, like explode") {
    val queries = Seq((1L, 0, Seq("a", "b")), (2L, 0, null.asInstanceOf[Seq[String]]))
      .toDF("userId", "cluster", "tokens")
    val corpus = Seq((10L, 0, Seq("a", "b"))).toDF("userId", "cluster", "tokens")
    val vocab = Some(Set("a", "b"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val exchange = asMap(Scoring.clusterCosine(queries, corpus, vocab))
    val local = asMap(Scoring.clusterCosine(queries, corpus, vocab,
      corpusPostings = Some(Scoring.termPostings(corpus, vocab)),
      broadcastQueries = true))
    assert(local == exchange, "lane parity must hold on null-token rows")
    assert(!local.keySet.exists(_._1 == 2L),
      "the null-token user must have no sims (falls to the hot fallback)")
  }

  test("vocab pruning drops out-of-vocabulary terms from scoring") {
    val queries = Seq((1L, 0, Seq("a", "z"))).toDF("userId", "cluster", "tokens")
    val corpus = Seq((10L, 0, Seq("a", "z"))).toDF("userId", "cluster", "tokens")
    val pruned = Scoring.clusterCosine(queries, corpus, Some(Set("a")))
      .as[(Long, Long, Double)].collect()
    // only "a" survives → both vectors reduce to [a] → cosine 1.0
    assert(pruned.length == 1 && math.abs(pruned.head._3 - 1.0) < 1e-12)
  }
}
