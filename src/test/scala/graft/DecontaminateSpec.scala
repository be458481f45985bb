package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSuite {
  import spark.implicits._

  // benchmark doc: one distinctive sentence; corpus doc 1 quotes it
  // verbatim (contaminated), 2 shares nothing, 3 shares a sub-threshold
  // fragment
  private lazy val corpus = Seq(
    (1L, "intro text then the quick sly fox jumped over the sleepy hound today and more filler"),
    (2L, "completely unrelated content about distributed query planning"),
    (3L, "the quick sly fox jumbles words differently after that")
  ).toDF("doc_id", "text")
  private lazy val benchmark = Seq(
    (100L, "the quick sly fox jumped over the sleepy hound today")
  ).toDF("doc_id", "text")

  test("withHits counts distinct shared n-grams; decontaminate drops above cut") {
    val hits = Decontaminate.withHits(corpus, benchmark, "text", n = 20)
      .select("doc_id", "overlap_hits").as[(Long, Int)].collect().toMap
    // doc 1 contains the full benchmark sentence: every 20-gram of the
    // quoted span matches (52-char sentence → 33 shared 20-grams)
    assert(hits(1L) == 33, s"got $hits")
    assert(hits(2L) == 0)
    // doc 3 shares only a 21-char prefix → exactly 2 of its 20-grams match
    assert(hits(3L) == 2)

    val kept = Decontaminate.decontaminate(corpus, benchmark, "text",
        n = 20, minHits = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("benchmarkGrams caps driver memory with a clear failure") {
    val err = intercept[IllegalArgumentException] {
      Decontaminate.benchmarkGrams(benchmark, "text", n = 3, maxGrams = 4)
    }
    assert(err.getMessage.contains("shards"))
  }

  test("dedupIncrement: shard survivors are exactly the non-near-dups of the index") {
    import graft.operators.Dedup
    val corpusDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines")
    ).toDF("doc_id", "text")
    val shard = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),    // dup of 1
      (11L, "the  quick   brown fox jumps over the lazy dog"), // ws-dup of 1
      (12L, "novel text that matches nothing in the corpus"),
      (13L, "spark engines process completely different content") // shares tokens, low jaccard
    ).toDF("doc_id", "text")
    val index = Dedup.lshIndex(corpusDocs, "doc_id", "text",
      shingleN = 3, bands = 16, rows = 4)
    val kept = Dedup.dedupIncrement(shard, index, "doc_id", "text",
        shingleN = 3, bands = 16, rows = 4, minJaccard = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 13L), s"got $kept")
    // the pair surface agrees with the exact query-vs-corpus Jaccard
    val pairs = Dedup.lshPairsAgainstIndex(shard, index, "doc_id", "text",
        shingleN = 3, bands = 16, rows = 4, minJaccard = 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 1L), (11L, 1L)))
  }

  test("corpus-side plan is a pure scan: no shuffle, no join") {
    val grams = Decontaminate.benchmarkGrams(benchmark, "text", n = 20)
    val plan = corpus.withColumn("h",
        Decontaminate.hitsColumn(col("text"), grams, 20, spark))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }
}
