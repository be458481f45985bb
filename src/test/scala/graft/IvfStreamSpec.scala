package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Round-10 item: the incremental-IVF operational loop CLOSED UNDER A
  * STREAM — foreachBatch ingestion appends a day's shard, and serving
  * queries against the same index directory pick up each new generation
  * across the boundary, exact at full probe. */
class IvfStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streamed shard appends: queries observe each generation, exact at full probe") {
    val dir = java.nio.file.Files.createTempDirectory("ivfstream").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.where(col("vec_id") < 300)
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dir,
      nCentroids = 8, seed = 42L)
    val queries = emb.where(col("vec_id") < 10)

    def served() = graft.operators.Ann.queryIvfIndex(
        queries, "vec_id", "embedding", dir, k = 5, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("c"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    def brute(corpus: org.apache.spark.sql.DataFrame) =
      graft.operators.Ann.bruteForceTopK(
        queries, corpus, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("c"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet

    val delta1 = emb.where(col("vec_id") >= 300 && col("vec_id") < 450)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val delta2 = emb.where(col("vec_id") >= 450)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val shards = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    // ProcessingTime keeps the ingest ALIVE between days — the serving
    // queries below run against a live, growing index
    val q = graft.jobs.IndexIngestJob.start(
      stream.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir,
      trigger = Trigger.ProcessingTime(0L),
      onShard = (b, s) => shards.synchronized { shards += ((b, s)); () })
    try {
      // generation 0: base only
      assert(served() == brute(base), "pre-append serving must equal base")
      // day 1 arrives
      stream.addData(delta1: _*)
      q.processAllAvailable()
      assert(shards.synchronized(shards.map(_._2).toSet) == Set(1),
        s"day-1 batch must commit shard 1: $shards")
      val day1Corpus = emb.where(col("vec_id") < 450)
      assert(served() == brute(day1Corpus),
        "query after day-1 append must observe the new generation exactly")
      // day 2 arrives while the same stream is still up
      stream.addData(delta2: _*)
      q.processAllAvailable()
      assert(shards.synchronized(shards.map(_._2).toSet) == Set(1, 2),
        s"day-2 batch must commit shard 2: $shards")
      assert(served() == brute(emb),
        "query after day-2 append must observe the full corpus exactly")
    } finally q.stop()
  }

  /** Round-11 item: PIN the scaladoc's at-least-once replay claim
    * (IndexIngestJob.scala:17-24) with a real checkpoint restart across
    * the torn window. The crash is injected AFTER appendIvfShard returns
    * (shard committed, marker on disk) but BEFORE foreachBatch returns
    * (checkpoint never commits the batch) — exactly the window the doc
    * reasons about. On restart from the checkpoint the batch replays into
    * a SECOND shard with the same rows; the claim under test is that
    * query results are nonetheless identical to a clean single-append
    * run, because the query path dedups (query_id, neighbor_id)
    * candidates and replayed vectors are bit-identical. */
  test("crash between shard commit and checkpoint commit: replay is result-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("ivfcrash").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivfcrash-ckpt").toString
    val controlDir = java.nio.file.Files.createTempDirectory("ivfcrash-ctl").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.where(col("vec_id") < 300)
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dir,
      nCentroids = 8, seed = 42L)
    // control: the SAME base index + ONE clean batch append of the delta
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding",
      controlDir, nCentroids = 8, seed = 42L)
    val deltaDf = emb.where(col("vec_id") >= 300 && col("vec_id") < 450)
      .select(col("vec_id"), col("embedding"))
    assert(graft.operators.Ann.appendIvfShard(
      deltaDf, "vec_id", "embedding", controlDir) == 1)
    val queries = emb.where(col("vec_id") < 10)
    def served(d: String) = graft.operators.Ann.queryIvfIndex(
        queries, "vec_id", "embedding", d, k = 5, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("c"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet

    val delta = deltaDf.as[(Long, Seq[Float])].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val shards = scala.collection.mutable.ArrayBuffer.empty[Int]
    // attempt 1: crash in the torn window — shard marker committed,
    // checkpoint not
    val q1 = graft.jobs.IndexIngestJob.start(
      stream.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckpt),
      onShard = (_, s) => {
        shards.synchronized { shards += s }
        throw new RuntimeException("injected crash after shard commit")
      })
    stream.addData(delta: _*)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(err.getMessage.contains("injected crash"), err.getMessage)
    assert(shards.synchronized(shards.toSeq) == Seq(1),
      s"the crashed attempt must still have committed shard 1: $shards")
    // the committed-but-uncheckpointed shard is already visible (the
    // marker IS the commit) — not part of the replay claim, but pins that
    // the crash tore exactly where intended
    assert(served(dir) == served(controlDir),
      "shard 1 must serve after the crash (marker committed before it)")
    // restart from the checkpoint: the batch REPLAYS (at-least-once) and
    // must land in a second shard — shard 1's claim + commit stand
    val q2 = graft.jobs.IndexIngestJob.start(
      stream.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckpt),
      onShard = (_, s) => shards.synchronized { shards += s; () })
    try {
      q2.processAllAvailable()
      assert(shards.synchronized(shards.toSeq) == Seq(1, 2),
        s"the replayed batch must commit a SECOND shard: $shards")
      // the claim: duplicated rows across shards 1 and 2 are invisible —
      // results identical to the clean single-append control run
      assert(served(dir) == served(controlDir),
        "replayed duplicate shard must not change query results")
      assert(served(dir) == graft.operators.Ann.bruteForceTopK(
          queries, emb.where(col("vec_id") < 450), "vec_id", "embedding",
          k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("c"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet,
        "post-replay serving must stay exact at full probe")
      // and a FRESH batch after recovery takes the next free id — the
      // loop is live again, not wedged on the replayed window
      val delta2 = emb.where(col("vec_id") >= 450 && col("vec_id") < 470)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
      stream.addData(delta2: _*)
      q2.processAllAvailable()
      assert(shards.synchronized(shards.toSeq) == Seq(1, 2, 3),
        s"post-recovery batch must commit shard 3: $shards")
    } finally q2.stop()
  }

  test("empty micro-batches do not burn shard ids") {
    val dir = java.nio.file.Files.createTempDirectory("ivfstream2").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.operators.Ann.buildIvfIndex(
      emb.where(col("vec_id") < 100), "vec_id", "embedding", dir,
      nCentroids = 4, seed = 42L)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val shards = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = graft.jobs.IndexIngestJob.start(
      stream.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir,
      trigger = Trigger.ProcessingTime(0L),
      onShard = (_, s) => shards.synchronized { shards += s; () })
    try {
      q.processAllAvailable()   // no data yet — nothing should commit
      assert(shards.synchronized(shards.isEmpty))
      val delta = emb.where(col("vec_id") >= 100 && col("vec_id") < 120)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
      stream.addData(delta: _*)
      q.processAllAvailable()
      assert(shards.synchronized(shards.toSeq) == Seq(1),
        "first non-empty batch takes shard 1 — idle triggers burned none")
    } finally q.stop()
  }

  test("deploy-before-build race: a pre-build batch fails without committing, and a post-build restart replays it") {
    val dir = java.nio.file.Files.createTempDirectory("ivfnotyet").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("ivfnotyet-ckpt").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val shards = scala.collection.mutable.ArrayBuffer.empty[Int]
    def job() = graft.jobs.IndexIngestJob.start(
      stream.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir,
      trigger = Trigger.ProcessingTime(0L),
      checkpointLocation = Some(ckpt), compactAfterShards = 2,
      onShard = (_, s) => shards.synchronized { shards += s; () })
    // vectors arrive BEFORE the initial build: the append has no index
    // to land in, so the stream must fail LOUDLY (the startup-sweep
    // probe tolerated the missing index; silently dropping rows would
    // lose data) — and must NOT commit the batch to the checkpoint
    val q1 = job()
    stream.addData(emb.where(col("vec_id") >= 300 && col("vec_id") < 320)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq: _*)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    // r11 advice: the unbuilt-dir probe now fails FAST (no 100 ms retry
    // budget — that exists only for the non-atomic flip window), with the
    // same loud point-at-the-build message
    assert(err.getMessage.contains("buildIvfIndex"), err.getMessage)
    assert(shards.synchronized(shards.isEmpty))
    // the build lands; restarting from the same checkpoint REPLAYS the
    // failed batch — the deploy race is covered by the same
    // at-least-once machinery as the crash window, zero data loss
    graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", dir, nCentroids = 4, seed = 42L)
    val q2 = job()
    try {
      q2.processAllAvailable()
      assert(shards.synchronized(shards.toSeq) == Seq(1),
        "the pre-build batch must replay into shard 1 after the build")
      assert(spark.read.parquet(s"${graft.operators.Ann.resolveIvfDir(
          spark, dir)}/postings.parquet")
        .where(col("shard") === 1).count() == 20L,
        "exactly the replayed vectors must land")
    } finally q2.stop()
  }

  test("compactAfterShards: the ingest loop compacts itself with a deferred sweep, results exact throughout") {
    val dir = java.nio.file.Files.createTempDirectory("ivfselfmaint").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", dir, nCentroids = 8, seed = 42L)
    val gen0 = graft.operators.Ann.liveIvfGeneration(spark, dir)
    val queries = emb.where(col("vec_id") < 10)
    def served() = graft.operators.Ann.queryIvfIndex(
        queries, "vec_id", "embedding", dir, k = 5, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("c"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    def brute(corpus: org.apache.spark.sql.DataFrame) =
      graft.operators.Ann.bruteForceTopK(
        queries, corpus, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("c"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    def slice(a: Long, b: Long) =
      emb.where(col("vec_id") >= a && col("vec_id") < b)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
    def genDirs() = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-")).length

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val compactedAt = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.jobs.IndexIngestJob.start(
      stream.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir,
      trigger = Trigger.ProcessingTime(0L),
      compactAfterShards = 2,
      onCompact = b => compactedAt.synchronized { compactedAt += b; () })
    try {
      // batch 1: base(1 shard) + shard 1 = 2 committed — within budget
      stream.addData(slice(300, 450): _*)
      q.processAllAvailable()
      assert(compactedAt.synchronized(compactedAt.isEmpty),
        "compaction must not fire inside the shard budget")
      // batch 2: 3 committed > 2 — the loop compacts itself; the pointer
      // flips to the folded generation, the old one is RETAINED
      stream.addData(slice(450, 475): _*)
      q.processAllAvailable()
      assert(compactedAt.synchronized(compactedAt.nonEmpty),
        "compaction must fire past the shard budget")
      assert(graft.operators.Ann.liveIvfGeneration(spark, dir) != gen0)
      assert(graft.operators.Ann.committedIvfShardCount(spark, dir) == 1,
        "compaction must fold the shard count back to 1")
      assert(genDirs() == 2,
        "the superseded generation must be retained until the next batch")
      assert(served() == brute(emb.where(col("vec_id") < 475)),
        "post-compact serving must be exact over everything ingested")
      // batch 3: sweeps the superseded generation, then appends normally
      stream.addData(slice(475, 500): _*)
      q.processAllAvailable()
      assert(genDirs() == 1, "the deferred sweep must run on the next batch")
      assert(graft.operators.Ann.committedIvfShardCount(spark, dir) == 2)
      assert(served() == brute(emb),
        "post-sweep serving must be exact over the full corpus")
    } finally q.stop()
  }
}
