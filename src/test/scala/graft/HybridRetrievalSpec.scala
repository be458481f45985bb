package graft

import org.apache.spark.sql.functions._
import graft.jobs.LexIngestJob
import graft.operators.{Ann, Retrieval, TfIdf}

/** Round-13: hybrid first-stage retrieval served from the two streaming
  * index families (lexical postings + IVF), RRF-fused — pinned against a
  * from-first-principles fusion of exact BM25 and brute-force cosine
  * computed OUTSIDE both index paths (plain JVM arithmetic over
  * collected rows), so an indexing bug on either leg cannot cancel
  * itself out of the comparison. */
class HybridRetrievalSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val terms = Seq("data", "table", "fast")
  private val k = 20
  private val kRrf = 60

  private lazy val docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
  private lazy val emb = spark.read
    .parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val queryVec: Array[Float] =
    emb.where(col("vec_id") === 0L).select("embedding")
      .as[Array[Float]].head()

  /** Expected fusion, from first principles (mirrors the r1 gate's
    * ranking discipline: lex by score desc then id; dense by cosine
    * rounded to 6 desc then id). */
  private lazy val expected: Map[Long, Double] = {
    val bm = TfIdf.bm25(docs, "doc_id", "toks", terms)
      .as[(Long, Double)].collect()
    val lexRanked = bm.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }
    val vecs = emb.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val denseRanked = vecs
      .map { case (id, v) =>
        (id, BigDecimal(cos(queryVec, v))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }.take(k)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }
    (lexRanked ++ denseRanked)
      .groupBy(_._1)
      .map { case (id, rs) =>
        id -> rs.map { case (_, r) => 1.0 / (kRrf + r) }.sum }
  }

  test("served hybrid RRF equals the first-principles fusion of exact BM25 + brute cosine") {
    val lexDir = java.nio.file.Files.createTempDirectory("hyblex").toString
    val ivfDir = java.nio.file.Files.createTempDirectory("hybivf").toString
    LexIngestJob.seed(docs, "doc_id", "toks", lexDir)
    // nProbe = nCentroids: the dense leg's ranks are exact, so the spec
    // isolates the FUSION plan (recall is the IVF suite's concern)
    Ann.buildIvfIndex(emb, "vec_id", "embedding", ivfDir, nCentroids = 8)
    val got = Retrieval.hybridRrf(spark, lexDir, ivfDir, terms, queryVec,
        k = k, nProbe = 8, kRrf = kRrf)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet,
      s"candidate sets differ: extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet}")
    for ((id, w) <- expected)
      assert(math.abs(got(id) - w) < 1e-12, s"doc $id: ${got(id)} vs $w")
    // both legs must actually contribute (guards against one leg
    // silently empty): the fused candidate set is strictly larger than
    // one leg's k and at most both legs' 2k
    assert(expected.size > k && expected.size <= 2 * k,
      s"fused candidate count ${expected.size} not in (k, 2k] — one leg " +
        "contributed nothing (or the comparison lists are degenerate)")
  }

  test("hybrid keeps serving identical results across a lexical fold and an IVF compact") {
    val lexDir = java.nio.file.Files.createTempDirectory("hyblex2").toString
    val ivfDir = java.nio.file.Files.createTempDirectory("hybivf2").toString
    // split the corpus: seed half, append half — both indexes carry
    // batch/shard state worth folding
    val first = docs.where(col("doc_id") < 250)
    val rest = docs.where(col("doc_id") >= 250)
    LexIngestJob.seed(first, "doc_id", "toks", lexDir)
    LexIngestJob.componentsOf(rest, "doc_id", "toks") match {
      case (p, l) => LexIngestJob.genLog(lexDir).writeShard(
        Seq(p, l, LexIngestJob.statsOf(l)), 0L)
    }
    Ann.buildIvfIndex(emb.where(col("vec_id") < 250), "vec_id",
      "embedding", ivfDir, nCentroids = 8)
    Ann.appendIvfShard(emb.where(col("vec_id") >= 250), "vec_id",
      "embedding", ivfDir)
    def serve(): Map[Long, Double] =
      Retrieval.hybridRrf(spark, lexDir, ivfDir, terms, queryVec,
        k = k, nProbe = 8, kRrf = kRrf).as[(Long, Double)].collect().toMap
    val before = serve()
    assert(before.keySet == expected.keySet && expected.forall {
      case (id, w) => math.abs(before(id) - w) < 1e-12 },
      "pre-maintenance serve must already match the first-principles fusion")
    // maintenance on both families: lexical fold + IVF compact — pure
    // relayout, results must be bit-identical
    LexIngestJob.genLog(lexDir).fold(spark, 0L)
    Ann.compactIvfIndex(spark, ivfDir)
    val after = serve()
    assert(after == before,
      "maintenance on either family must never change served results")
  }
}
