package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Round-12 (r11 verdict 5): the two ingest loops COMPOSED end-to-end —
  * the LLM-pipeline operational flow this engine is built for is
  * dedup → embed → index → serve as ONE chain, not two spec-pinned
  * islands. [[graft.jobs.DedupIngestJob]] writes survivors as per-batch
  * parquet dirs; a file-source stream embeds them (deterministic fake —
  * the Spark-side plumbing is the thing under test) and feeds
  * [[graft.jobs.IndexIngestJob]]. The per-loop replay arguments compose,
  * but composition is where torn windows INTERACT: a stage-1 replay
  * rewrites survivor files the stage-2 source may already track, and a
  * stage-2 crash leaves a committed shard the replayed handoff appends
  * again. Both injected here; the chain must stay result-idempotent. */
class ComposedIngestSpec extends SparkSuite {
  import spark.implicits._

  private val Dims = 8

  /** Deterministic fake embedding: 8 hash-derived floats of the text.
    * Bit-stable across replays (the property the idempotence argument
    * leans on: a replayed row embeds identically). */
  private def fakeEmb(c: Column): Column =
    transform(sequence(lit(0), lit(Dims - 1)),
      i => (pmod(xxhash64(c, i), lit(1000L)).cast("float") / lit(100.0f))
        - lit(5.0f))

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  private def served(ivfDir: String, queries: DataFrame) =
    graft.operators.Ann.queryIvfIndex(
        queries, "doc_id", "embedding", ivfDir, k = 5, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("c"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet

  test("dedup -> embed -> index chain: crashes on both sides of the handoff replay to the same served index") {
    val root = java.nio.file.Files.createTempDirectory("composed").toString
    val dedupDir = s"$root/dedup"
    val ivfDir = s"$root/ivf"
    val controlDir = s"$root/ivf-control"
    val ckptD = s"$root/ckpt-dedup"
    val ckptI = s"$root/ckpt-ivf"

    // ---- seed state: an existing deduplicated corpus, already indexed
    val seedDocs = docs.where(col("doc_id") < 40)
    graft.jobs.DedupIngestJob.seed(seedDocs, "doc_id", "text", dedupDir)
    val seedEmb = seedDocs.withColumn("embedding", fakeEmb(col("text")))
    graft.operators.Ann.buildIvfIndex(seedEmb, "doc_id", "embedding",
      ivfDir, nCentroids = 4, seed = 42L)
    graft.operators.Ann.buildIvfIndex(seedEmb, "doc_id", "embedding",
      controlDir, nCentroids = 4, seed = 42L)

    // ---- stage 1: streaming dedup against seed + prior survivors
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    def dedupJob(crash: Boolean) = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dedupDir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckptD),
      onBatch = (_, _) =>
        if (crash) throw new RuntimeException("injected stage-1 crash"))

    // batch 0 carries: a near-dup of a seed doc (dropped), an intra-batch
    // near-dup pair (one survives), a unique doc (survives)
    val seedText = seedDocs.where(col("doc_id") === 5L)
      .select("text").head().getString(0)
    val uniq1 = "entirely novel text about wavelet trees and succinct " +
      "rank select dictionaries for compressed suffix arrays"
    val uniq2 = "fresh unrelated prose describing tidal estuaries and " +
      "the migratory habits of arctic terns across two hemispheres"
    stream.addData(
      (1000L, seedText + " x"),
      (1001L, uniq1), (1002L, uniq1 + " y"),
      (1003L, uniq2))
    // CRASH 1: after the batch's survivor/index writes, before the
    // checkpoint commit — the handoff files exist, the batch replays
    val q1a = dedupJob(crash = true)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1a.processAllAvailable()
    }
    q1a.stop()
    // restart: the replay REWRITES survivors/batch=0 with identical rows
    val q1 = dedupJob(crash = false)
    q1.processAllAvailable()
    val survivors0 = graft.jobs.DedupIngestJob.survivors(spark, dedupDir)
      .select("doc_id").as[Long].collect().toSet
    assert(!survivors0.contains(1000L) && survivors0.contains(1003L) &&
      survivors0.intersect(Set(1001L, 1002L)).size == 1, survivors0.toString)

    // ---- stage 2: file-source handoff — embed survivors, append to IVF
    val survivorSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("batch", LongType)))
    val shards = scala.collection.mutable.ArrayBuffer.empty[Int]
    def indexJob(crash: Boolean) = graft.jobs.IndexIngestJob.start(
      spark.readStream.schema(survivorSchema)
        .parquet(s"$dedupDir/survivors")
        .withColumn("embedding", fakeEmb(col("text")))
        .select("doc_id", "embedding"),
      "doc_id", "embedding", ivfDir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckptI),
      onShard = (_, s) => {
        shards.synchronized { shards += s }
        if (crash) throw new RuntimeException("injected stage-2 crash")
      })
    val q2 = indexJob(crash = false)
    try {
      q2.processAllAvailable()
      assert(shards.synchronized(shards.toSeq) == Seq(1),
        s"batch-0 survivors must land as shard 1: $shards")
      // batch 1 flows through BOTH loops while they run
      stream.addData(
        (2000L, uniq2 + " z"), // near-dup of a batch-0 survivor: dropped
        (2001L, "statistical profiles of glacier meltwater chemistry " +
          "sampled across four alpine catchments in successive springs"))
      q1.processAllAvailable()
      q2.processAllAvailable()
      assert(shards.synchronized(shards.toSeq) == Seq(1, 2), shards.toString)
    } finally q2.stop()

    // ---- CRASH 2: the stage-2 torn window — shard committed, file-source
    // checkpoint not. The restarted chain re-appends the same rows.
    stream.addData(
      (3000L, "harmonic analysis of tidal resonance in semi-enclosed " +
        "basins with irregular bathymetry and rotating reference frames"))
    q1.processAllAvailable()
    val q2b = indexJob(crash = true)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2b.processAllAvailable()
    }
    q2b.stop()
    val q2c = indexJob(crash = false)
    try q2c.processAllAvailable() finally q2c.stop()
    q1.stop()

    // ---- the composed-replay claim: the served index answers exactly
    // like a CONTROL built from the same seed plus ONE clean append of
    // the final survivor set — despite a rewritten handoff dir and a
    // double-appended shard
    val finalSurvivors = graft.jobs.DedupIngestJob
      .survivors(spark, dedupDir)
    assert(finalSurvivors.select("doc_id").as[Long].collect().toSet
      .contains(3000L))
    graft.operators.Ann.appendIvfShard(
      finalSurvivors.withColumn("embedding", fakeEmb(col("text")))
        .select("doc_id", "embedding"),
      "doc_id", "embedding", controlDir)
    val queries = seedEmb.where(col("doc_id") < 8)
      .select("doc_id", "embedding")
    assert(served(ivfDir, queries) == served(controlDir, queries),
      "composed chain after two injected crashes must serve exactly the " +
        "clean-control results")
  }
}
