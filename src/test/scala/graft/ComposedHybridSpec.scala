package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Round-13: the FULL composed pipeline — dedup survivors fan out to
  * BOTH index families (embed → IVF and tokenize → lexical postings),
  * hybrid RRF serving on top. ComposedIngestSpec pins the dedup→IVF
  * chain's crash windows; this spec adds the third tenant and the
  * serving composition: the lexical leg takes a torn-window crash
  * (shard written, checkpoint not) and an in-loop tiered fold, and the
  * final [[graft.operators.Retrieval.hybridRrf]] answer must equal a
  * clean control built from the same final survivor set in one batch —
  * the composed at-least-once replays of three loops must cancel out of
  * the SERVED FUSION, not just each index separately. */
class ComposedHybridSpec extends SparkSuite {
  import spark.implicits._

  private val Dims = 8

  /** Deterministic fake embedding (bit-stable across replays — the same
    * helper shape ComposedIngestSpec uses). */
  private def fakeEmb(c: Column): Column =
    transform(sequence(lit(0), lit(Dims - 1)),
      i => ((pmod(xxhash64(c, i), lit(1000L)).cast("float") / lit(100.0f))
        - lit(5.0f)).cast("float"))

  private def tok(c: Column): Column = split(trim(c), "\\s+")

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  private val terms = Seq("data", "table", "fast")

  test("dedup -> {embed->ivf, tokenize->lex} -> hybrid: crash + fold in the lex leg, served fusion equals clean control") {
    val root = java.nio.file.Files.createTempDirectory("comphyb").toString
    val dedupDir = s"$root/dedup"
    val ivfDir = s"$root/ivf"; val ivfCtl = s"$root/ivf-ctl"
    val lexDir = s"$root/lex"; val lexCtl = s"$root/lex-ctl"

    // ---- seed: an existing deduplicated corpus, indexed in BOTH
    // families (live + control pairs)
    val seedDocs = docs.where(col("doc_id") < 40)
    graft.jobs.DedupIngestJob.seed(seedDocs, "doc_id", "text", dedupDir)
    val seedEmb = seedDocs.withColumn("embedding", fakeEmb(col("text")))
    Seq(ivfDir, ivfCtl).foreach(d => graft.operators.Ann.buildIvfIndex(
      seedEmb, "doc_id", "embedding", d, nCentroids = 4, seed = 42L))
    val seedTok = seedDocs.select(col("doc_id"), tok(col("text")).as("toks"))
    Seq(lexDir, lexCtl).foreach(d =>
      graft.jobs.LexIngestJob.seed(seedTok, "doc_id", "toks", d))

    // ---- stage 1: streaming dedup (no crash here — ComposedIngestSpec
    // owns that window; this spec exercises the lex leg's)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q1 = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dedupDir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(s"$root/ckpt-dedup"))
    val seedText = seedDocs.where(col("doc_id") === 5L)
      .select("text").head().getString(0)
    val uniq1 = "entirely novel text about wavelet trees and succinct " +
      "rank select dictionaries for compressed suffix arrays"
    stream.addData(
      (1000L, seedText + " x"), // near-dup of seed: dropped
      (1001L, uniq1))           // survives
    q1.processAllAvailable()

    // ---- stage 2: the survivors dir is the replayable handoff into
    // BOTH index legs
    val survivorSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("batch", LongType)))
    def survivorStream = spark.readStream.schema(survivorSchema)
      .parquet(s"$dedupDir/survivors")
    val q2 = graft.jobs.IndexIngestJob.start(
      survivorStream.withColumn("embedding", fakeEmb(col("text")))
        .select("doc_id", "embedding"),
      "doc_id", "embedding", ivfDir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(s"$root/ckpt-ivf"))
    val folds = new java.util.concurrent.atomic.AtomicInteger
    def lexJob(crash: Boolean) = graft.jobs.LexIngestJob.start(
      survivorStream.select(col("doc_id"), tok(col("text")).as("toks")),
      "doc_id", "toks", lexDir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(s"$root/ckpt-lex"),
      foldAfterBatches = 1, sweepMinAgeMs = 0L,
      onFold = _ => { folds.incrementAndGet(); () },
      onBatch = (_, _) =>
        if (crash) throw new RuntimeException("injected lex-leg crash"))

    // CRASH: the lex leg's torn window — postings shard written,
    // checkpoint not committed; the restart replays the batch into the
    // same overwrite-keyed dirs
    val q3a = lexJob(crash = true)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3a.processAllAvailable()
    }
    q3a.stop()
    val q3 = lexJob(crash = false)
    try {
      q2.processAllAvailable()
      q3.processAllAvailable()

      // batch 1 flows through all three loops live; the lex budget
      // (foldAfterBatches=1, seed shard + replayed batch + this one)
      // fires a tiered fold inside the composed chain
      stream.addData(
        (2000L, uniq1 + " y"), // near-dup of a batch-0 survivor: dropped
        (2001L, "statistical profiles of glacier meltwater chemistry " +
          "sampled across four alpine catchments in successive springs"))
      q1.processAllAvailable()
      q2.processAllAvailable()
      q3.processAllAvailable()
      assert(folds.get() >= 1,
        "the lex leg's in-loop fold must have fired inside the chain")
    } finally { q3.stop(); q2.stop(); q1.stop() }

    // ---- clean controls: ONE batch of the final survivor set
    val finalSurvivors = graft.jobs.DedupIngestJob
      .survivors(spark, dedupDir)
    val ids = finalSurvivors.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1000L) && !ids.contains(2000L) &&
      ids.contains(1001L) && ids.contains(2001L), ids.toString)
    graft.operators.Ann.appendIvfShard(
      finalSurvivors.withColumn("embedding", fakeEmb(col("text")))
        .select("doc_id", "embedding"),
      "doc_id", "embedding", ivfCtl)
    val (cp, cl) = graft.jobs.LexIngestJob.componentsOf(
      finalSurvivors.select(col("doc_id"), tok(col("text")).as("toks")),
      "doc_id", "toks")
    graft.jobs.LexIngestJob.genLog(lexCtl).writeShard(
      Seq(cp, cl, graft.jobs.LexIngestJob.statsOf(cl)), 0L)

    // ---- the composed claim: the HYBRID FUSION served from the
    // crash-replayed, folded live indexes equals the clean control
    val queryVec = seedEmb.where(col("doc_id") === 5L)
      .select("embedding").as[Array[Float]].head()
    def fusion(lex: String, ivf: String): Map[Long, Double] =
      graft.operators.Retrieval.hybridRrf(spark, lex, ivf, terms,
        queryVec, k = 15, nProbe = 4).as[(Long, Double)].collect().toMap
    val live = fusion(lexDir, ivfDir)
    val ctl = fusion(lexCtl, ivfCtl)
    assert(live.keySet == ctl.keySet,
      s"extra=${live.keySet -- ctl.keySet} missing=${ctl.keySet -- live.keySet}")
    for ((id, w) <- ctl)
      assert(math.abs(live(id) - w) < 1e-12, s"doc $id: ${live(id)} vs $w")
  }
}
