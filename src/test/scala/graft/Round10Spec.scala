package graft

import org.apache.spark.sql.functions._

/** Round-10 behavior pins for the r9 advice items: secret keys must never
  * reach plan strings, the vocab-fingerprint guard must be symmetric, and
  * a commit-marker collision in the IVF append must never delete data the
  * marker declares committed. */
class Round10Spec extends SparkSuite {
  import spark.implicits._

  test("pseudonymize keys are redacted from every plan string surface") {
    import graft.functions.TextFunctions.{pseudonymizeEmails, pseudonymizeEmailsSecure}
    val secret = "hunter2-totally-secret-key"
    val df = Seq((1L, "mail alice@example.com")).toDF("id", "t")
      .select(pseudonymizeEmailsSecure(col("t"), secret).as("p"),
        pseudonymizeEmails(col("t"), secret).as("q"))
    // the surfaces the advice names: explain() (analyzed + optimized +
    // physical), the UI SQL tab (expression .sql), and event logs (plan
    // toString) all render through these strings
    val qe = df.queryExecution
    val surfaces = Seq(
      qe.analyzed.toString, qe.optimizedPlan.toString,
      qe.executedPlan.toString, qe.toString,
      qe.analyzed.expressions.map(_.sql).mkString("; "))
    surfaces.zipWithIndex.foreach { case (s, i) =>
      assert(!s.contains(secret), s"plan surface $i leaks the key: $s")
    }
    assert(qe.analyzed.toString.contains("[redacted]"),
      "the redaction placeholder should be visible where the key was")
    // redaction must not break evaluation
    assert(df.head().getString(0).contains("@redacted.example"))
  }

  test("clusterCosine refuses string-term corpusPostings when a vocab is passed") {
    val vocab = Set("alpha", "beta", "gamma")
    val queries = Seq((1L, 0, Seq("alpha", "beta")))
      .toDF("userId", "cluster", "tokens")
    val corpus = Seq((2L, 0, Seq("alpha", "gamma")), (3L, 0, Seq("beta")))
      .toDF("userId", "cluster", "tokens")
    // postings built WITHOUT a vocab carry raw string terms and no
    // fingerprint column — joining them against an int-indexed query side
    // would match nothing and silently route every user to the fallback
    val stringPostings = graft.rank.Scoring.termPostings(corpus, None)
    val e = intercept[IllegalArgumentException] {
      graft.rank.Scoring.clusterCosine(queries, corpus, Some(vocab),
        corpusPostings = Some(stringPostings))
    }
    assert(e.getMessage.contains("no vocabulary fingerprint"),
      s"guard must name the failure: ${e.getMessage}")
    // the matched configuration still works
    val ok = graft.rank.Scoring.clusterCosine(queries, corpus, Some(vocab),
      corpusPostings = Some(graft.rank.Scoring.termPostings(corpus, Some(vocab))))
    assert(ok.count() > 0)
  }

  test("Tuning: partitions-for-data is floor-clamped, monotone, and capped") {
    import graft.operators.Tuning
    // floor: small inputs keep the session setting — the sf0.01 gate-plan
    // invariant (every gate query plans exactly as before the knob)
    assert(Tuning.partitionsForRows(500, 32) == 32)
    assert(Tuning.partitionsForRows(65536, 32) == 32)   // 65536/2048 = 32
    // engagement: SCALING §50× calibration point — 250k docs → ~123
    assert(Tuning.partitionsForRows(250000, 32) == 123)
    assert(Tuning.partitionsForRows(500000, 32) == 245)
    // cap
    assert(Tuning.partitionsForRows(Long.MaxValue / 4, 32) == Tuning.MaxPartitions)
    // bytes estimator: unknown/absurd stats keep the floor
    assert(Tuning.partitionsForBytes(BigInt(-1), 32) == 32)
    assert(Tuning.partitionsForBytes(BigInt(Long.MaxValue) * 100, 32) == 32)
    assert(Tuning.partitionsForBytes(BigInt(2L << 30), 32) == 256)  // 2GiB*8/64MiB
  }

  test("Tuning.withShufflePartitions raises, restores, and never lowers") {
    import graft.operators.Tuning
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    Tuning.withShufflePartitions(spark, before.toInt + 10) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") ==
        (before.toInt + 10).toString)
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "caller's setting must be restored")
    // restore survives a failure inside the scope
    intercept[RuntimeException] {
      Tuning.withShufflePartitions(spark, before.toInt + 10) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    // never lowers
    Tuning.withShufflePartitions(spark, 1) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    }
  }

  test("CorpusPrep auto-shuffle: floor at gate scale, engaged when rows demand it") {
    import graft.operators.Tuning
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // gate scale: the knob must NOT engage (sf0.01 plans unchanged)
    graft.jobs.CorpusPrep.prepare(docs, "doc_id", "text").count()
    assert(Tuning.lastChosen == before.toInt,
      s"knob engaged at gate scale: chose ${Tuning.lastChosen}")
    // forced engagement via the ops override: tiny rows-per-partition
    // makes this corpus "large" without needing a 50x fixture in a spec
    System.setProperty("graft.tuning.rowsPerPartition", "8")
    try {
      val expect = Tuning.partitionsForRows(docs.count(), before.toInt)
      assert(expect > before.toInt, "override failed to force engagement")
      graft.jobs.CorpusPrep.prepare(docs, "doc_id", "text").count()
      assert(Tuning.lastChosen == expect,
        s"expected $expect, chose ${Tuning.lastChosen}")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
        "session setting must be restored after prepare")
    } finally System.clearProperty("graft.tuning.rowsPerPartition")
  }

  test("SuffixDedup auto-shuffle: chars estimator floors at gate scale, engages when forced") {
    import graft.operators.{SuffixDedup, Tuning}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def regions(): Long = {
      val s = SuffixDedup.duplicatedRegionsStaged(docs, "doc_id", "text", 64)
      val n = s.df.count(); s.release(); n
    }
    // gate scale: total chars are far under one charsPerPartition unit,
    // so the knob must not engage and the d14 gate plans stay unchanged
    val nFloor = regions()
    assert(Tuning.lastChosen == before.toInt,
      s"chars knob engaged at gate scale: chose ${Tuning.lastChosen}")
    // forced engagement via the ops override — and the RESULT is
    // partition-count-invariant (same regions either way)
    System.setProperty("graft.tuning.charsPerPartition", "1000")
    try {
      val nRaised = regions()
      assert(Tuning.lastChosen > before.toInt,
        "override failed to force the chars knob")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
        "session setting must be restored")
      assert(nRaised == nFloor,
        s"region count changed with partitions: $nFloor vs $nRaised")
    } finally System.clearProperty("graft.tuning.charsPerPartition")
  }

  test("appendIvfShard: commit-marker collision leaves marker-committed files intact") {
    val dir = java.nio.file.Files.createTempDirectory("ivfcollide").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.where(col("vec_id") < 300)
    val delta = emb.where(col("vec_id") >= 300 && col("vec_id") < 400)
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dir,
      nCentroids = 4, seed = 42L)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val gdir = graft.operators.Ann.resolveIvfDir(spark, dir)
    val postings = s"$gdir/postings.parquet"
    val buildId = {
      val in = fs.open(new org.apache.hadoop.fs.Path(postings, "_BUILD_ID"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    // simulate the fencing bypass mid-flight: a rogue writer creates
    // shard 1's COMMIT marker AFTER this append claims id 1 (a marker
    // created before the claim would just make the appender skip to id
    // 2 — the collision is by definition a race). The watcher waits for
    // the append's STAGING write to start — past the r11 pre-claim
    // marker guard, so this pin deterministically exercises the LATE
    // collision (the final commit-time require); the early window
    // (marker planted before the guard's check) is the same fail-loud
    // require one line higher.
    val staging = new org.apache.hadoop.fs.Path(s"$gdir/.append-shard-1")
    val rogue = new Thread(() => {
      while (!fs.exists(staging)) Thread.sleep(20)
      fs.create(new org.apache.hadoop.fs.Path(postings,
        s"_SHARD_COMMIT_${buildId}_1"), false).close()
    })
    rogue.setDaemon(true)
    rogue.start()
    val e = intercept[IllegalArgumentException] {
      graft.operators.Ann.appendIvfShard(delta, "vec_id", "embedding", dir)
    }
    rogue.join(5000)
    assert(e.getMessage.contains("rebuild the index"),
      s"collision must demand a rebuild: ${e.getMessage}")
    // the r9 advice scenario: the marker says shard 1 is committed, so
    // cleanup must NOT have deleted the cell=*/shard=1 files out from
    // under serving queries — they stay for inspection/rebuild
    val live = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$postings/cell=*/shard=1"))
    assert(live != null && live.nonEmpty,
      "marker-committed shard files were deleted by failure cleanup")
    // and the claim is retained too (releasing it would invite a second
    // appender into the same corrupt state)
    assert(fs.exists(new org.apache.hadoop.fs.Path(postings,
      s"_SHARD_CLAIM_${buildId}_1")), "claim marker must be retained")
  }
}
