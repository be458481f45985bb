package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Tiered index maintenance (r12 verdict 1): both maintenance ops used to
  * rewrite the ENTIRE base generation per fire — O(corpus) per fire,
  * quadratic lifetime write volume over an ingest's life. The tiered
  * form keeps the pointer on an ordered generation LIST: minor fires
  * fold only the new material into sibling generations (base untouched),
  * major fires collapse everything geometrically. These specs pin the
  * tiering against EXACTNESS (results identical to the flat form and to
  * brute force at full probe) and against the pointer protocol
  * (crash/lost discrimination, sweep, append routing). */
class TieredMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def served(dir: String, nProbe: Int) =
    graft.operators.Ann.queryIvfIndex(
        emb.where(col("vec_id") < 10), "vec_id", "embedding", dir,
        k = 5, nProbe = nProbe)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet

  private def brute(corpus: org.apache.spark.sql.DataFrame) =
    graft.operators.Ann.bruteForceTopK(
        emb.where(col("vec_id") < 10), corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet

  // ------------------------------------------------------------------ IVF
  test("IVF tiered compaction: minor fires freeze the tail, the base is never rewritten, results stay exact; a major fire collapses the list") {
    val dir = java.nio.file.Files.createTempDirectory("ivftier").toString
    val base = emb.where(col("vec_id") < 400)
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dir,
      nCentroids = 8, seed = 42L)
    val baseGen0 = graft.operators.Ann.resolveIvfDirs(spark, dir).head

    // fire 1 on a single-gen index: a MAJOR-SPLIT — base + fresh tail
    val rows1 = graft.operators.Ann.compactIvfIndexTiered(spark, dir,
      baseRatio = 0.3)
    assert(rows1 == 400L)
    val gens1 = graft.operators.Ann.resolveIvfDirs(spark, dir)
    assert(gens1.size == 2, s"major-split must leave base+tail: $gens1")
    assert(served(dir, nProbe = 8) == brute(base),
      "full-probe results must equal brute force after the split")

    // appends land in the TAIL, not the base
    graft.operators.Ann.appendIvfShard(
      emb.where(col("vec_id") >= 400 && col("vec_id") < 440),
      "vec_id", "embedding", dir)
    val tailPostings = s"${gens1.last}/postings.parquet"
    assert(new java.io.File(tailPostings).listFiles()
      .exists(_.getName.startsWith("cell=")),
      "the appended shard must land in the tail generation")
    val baseMtime = new java.io.File(
      s"${gens1.head}/postings.parquet").lastModified()

    // fire 2 with a LOW ratio on a big base: MINOR — tail frozen into a
    // sibling, fresh tail opened, base dir untouched
    val rows2 = graft.operators.Ann.compactIvfIndexTiered(spark, dir,
      baseRatio = 0.9)
    assert(rows2 == 40L, s"minor fire folds only the tail: $rows2")
    val gens2 = graft.operators.Ann.resolveIvfDirs(spark, dir)
    assert(gens2.size == 3, s"minor fire appends a sibling: $gens2")
    assert(gens2.head == gens1.head, "the base generation is retained")
    assert(new java.io.File(
      s"${gens2.head}/postings.parquet").lastModified() == baseMtime,
      "a minor fire must not rewrite the base postings")
    val corpus2 = emb.where(col("vec_id") < 440)
    assert(served(dir, nProbe = 8) == brute(corpus2),
      "full-probe results must equal brute force across the tier")

    // an empty tail makes the next minor fire a no-op
    assert(graft.operators.Ann.compactIvfIndexTiered(spark, dir,
      baseRatio = 0.9) == 0L)

    // fire 3 with ratio 0: forced MAJOR — collapses to base + tail
    graft.operators.Ann.appendIvfShard(
      emb.where(col("vec_id") >= 440 && col("vec_id") < 470),
      "vec_id", "embedding", dir)
    val rows3 = graft.operators.Ann.compactIvfIndexTiered(spark, dir,
      baseRatio = 0.0)
    assert(rows3 == 470L, s"major fire folds everything: $rows3")
    val gens3 = graft.operators.Ann.resolveIvfDirs(spark, dir)
    assert(gens3.size == 2 && gens3.head != baseGen0)
    val corpus3 = emb.where(col("vec_id") < 470)
    assert(served(dir, nProbe = 8) == brute(corpus3))

    // superseded generations are gone; only the live list remains
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).toSet
    assert(onDisk == gens3.map(g =>
      new org.apache.hadoop.fs.Path(g).getName).toSet,
      s"cleanup must leave exactly the live list: $onDisk vs $gens3")
  }

  test("legacy compactIvfIndex on a tiered index collapses the whole list to one generation") {
    val dir = java.nio.file.Files.createTempDirectory("ivftierlegacy").toString
    graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", dir, nCentroids = 8, seed = 42L)
    graft.operators.Ann.compactIvfIndexTiered(spark, dir, baseRatio = 0.3)
    graft.operators.Ann.appendIvfShard(
      emb.where(col("vec_id") >= 300 && col("vec_id") < 330),
      "vec_id", "embedding", dir)
    assert(graft.operators.Ann.resolveIvfDirs(spark, dir).size == 2)
    val rows = graft.operators.Ann.compactIvfIndex(spark, dir)
    assert(rows == 330L)
    assert(graft.operators.Ann.resolveIvfDirs(spark, dir).size == 1)
    assert(served(dir, nProbe = 8) ==
      brute(emb.where(col("vec_id") < 330)))
  }

  test("the streaming ingest loop runs tiered compaction when compactBaseRatio is set; queries observe every shard exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivftierstream").toString
    graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 400),
      "vec_id", "embedding", dir, nCentroids = 8, seed = 42L)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val compacts = new java.util.concurrent.atomic.AtomicInteger
    val q = graft.jobs.IndexIngestJob.start(
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, trigger = Trigger.ProcessingTime(0L),
      compactAfterShards = 2, compactBaseRatio = 0.9,
      onCompact = _ => { compacts.incrementAndGet(); () })
    try {
      val rows = emb.where(col("vec_id") >= 400 && col("vec_id") < 460)
        .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      rows.grouped(20).foreach { g =>
        stream.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
      assert(compacts.get() >= 1, "the budgeted tiered fire must have run")
      assert(served(dir, nProbe = 8) ==
        brute(emb.where(col("vec_id") < 460)),
        "results must stay exact through streamed tiered maintenance")
      assert(graft.operators.Ann.resolveIvfDirs(spark, dir).size >= 2,
        "tiered maintenance leaves a generation list")
    } finally q.stop()
  }

  // ---------------------------------------------------------------- dedup
  test("dedup tiered fold: minor folds retain the base and still catch near-dups; a major fold collapses; survivors identical to the fold-off control") {
    // bodies must be mutually DISTINCT (pairwise Jaccard well under the
    // 0.8 threshold) — a shared sentence template near-dups every doc
    // against every other and the whole stream dedups to nothing
    val bank = ("partition pruning shuffle hygiene skew salting broadcast " +
      "exchange codegen vector posting centroid manifest pointer fence " +
      "ledger estuary tern falcon harbor basalt quartz meadow cedar " +
      "lantern compass saddle anvil crucible spindle turbine dynamo " +
      "aqueduct viaduct culvert gabion revetment breakwater jetty quay " +
      "bollard capstan windlass davit gunwale keelson futtock").split(" ")
    val mk = (i: Long, salt: String) => (i,
      s"doc $i $salt " + new scala.util.Random(i * 1000L + salt.length)
        .shuffle(bank.toSeq).take(24).mkString(" "))
    val seedDocs = (0L until 40L).map(i => mk(i, "alpha")).toDF("doc_id", "text")
    // the fold budget (1) fires after batches 0, 2 and 4; batch 1+2 and
    // 3+4 fold together. 102 near-dups the SEED (major-folded base);
    // 300 near-dups 200 while 200 is still an unfolded batch dir;
    // 400 near-dups 201 AFTER 201 was minor-folded into a sibling
    // generation — the assertion tiering exists to protect.
    val batches = Seq(
      Seq(mk(100L, "beta"), mk(101L, "gamma"),
        (102L, seedDocs.where(col("doc_id") === 5L).head().getString(1) + " x")),
      Seq(mk(200L, "delta"), mk(201L, "epsilon"), mk(202L, "zeta")),
      Seq((300L, mk(200L, "delta")._2 + " y"), mk(301L, "eta")),
      Seq((400L, mk(201L, "epsilon")._2 + " z"), mk(401L, "theta")),
      Seq(mk(500L, "iota"), mk(501L, "kappa")))
    val expected = Set(100L, 101L, 200L, 201L, 202L, 301L, 401L, 500L, 501L)

    def run(ratio: Double, maxGens: Int): (Set[Long], Int, Seq[String]) = {
      val dir = java.nio.file.Files.createTempDirectory("deduptier").toString
      graft.jobs.DedupIngestJob.seed(seedDocs, "doc_id", "text", dir)
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val folds = new java.util.concurrent.atomic.AtomicInteger
      val q = graft.jobs.DedupIngestJob.start(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
        trigger = Trigger.ProcessingTime(0L), foldAfterBatches = 1,
        foldBaseRatio = ratio, maxLiveGens = maxGens,
        onFold = _ => { folds.incrementAndGet(); () })
      try {
        batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
        val ids = graft.jobs.DedupIngestJob.survivors(spark, dir)
          .select("doc_id").as[Long].collect().toSet
        val gens = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$dir/index/FOLDED")).trim
          .split("\\s+")(1).split(",").toSeq
        (ids, folds.get(), gens)
      } finally q.stop()
    }

    // huge ratio vs the 40-doc base → folds after batches 0 (major: no
    // gens yet), 2 and 4 (minor): the pointer grows a generation list
    val (idsTiered, foldsT, gensT) = run(ratio = 50.0, maxGens = 8)
    assert(foldsT == 3, s"budget-1 folds fire after batches 0/2/4: $foldsT")
    assert(gensT.length == 3,
      s"two minor folds must grow the list to 3: $gensT")
    assert(!idsTiered.contains(102L), "near-dup of the folded base missed")
    assert(!idsTiered.contains(300L), "near-dup of an unfolded batch missed")
    assert(!idsTiered.contains(400L),
      "near-dup of a minor-folded survivor missed")
    assert(idsTiered == expected)

    // ratio 0 → every fold MAJOR (the pre-tiering behavior): one
    // generation, identical survivors
    val (idsFlat, _, gensF) = run(ratio = 0.0, maxGens = 8)
    assert(gensF.length == 1,
      s"ratio 0 must keep the single-generation layout: $gensF")
    assert(idsFlat == idsTiered,
      "tiered and flat folds must accept identical survivors")

    // maxGens = 2 forces the third fold MAJOR even at a huge ratio
    val (idsCap, _, gensC) = run(ratio = 50.0, maxGens = 2)
    assert(gensC.length == 1,
      s"maxLiveGens must force a collapsing major fold: $gensC")
    assert(idsCap == idsTiered)
  }
}
