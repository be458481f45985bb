package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Dedup, FuzzyJoin, Sampling}

/** Round-7 behavior pins: the positions-only boilerplate rewrite keeps its
  * contract on the degenerate inputs the old explode-regroup shape dropped
  * (ADVICE r6). */
class Round7Spec extends SparkSuite {
  import spark.implicits._

  test("boilerplate: zero-line and null-lines docs surface with n_kept = 0") {
    val docs = Seq(
      (1L, "nav\nalpha"),
      (2L, "nav\nbeta"),
      (3L, ""),                       // split("") -> [""], df("")=1 -> kept
      (4L, null.asInstanceOf[String]) // split(null) -> null lines array
    ).toDF("id", "text")
    val out = Dedup.boilerplateRemove(docs, "id",
        when(col("text").isNull, lit(null).cast("array<string>"))
          .otherwise(filter(split(col("text"), "\n"), _ =!= "")),
        minDf = 2, sep = "\n")
      .orderBy("id").collect()
    assert(out.length == 4, "every input id must surface")
    assert(out(0).getAs[String]("kept_text") == "alpha")
    assert(out(1).getAs[String]("kept_text") == "beta")
    for (i <- Seq(2, 3)) {
      assert(out(i).getAs[Long]("n_lines") == 0L, s"doc ${i + 1}")
      assert(out(i).getAs[Long]("n_kept") == 0L, s"doc ${i + 1}")
      assert(out(i).getAs[String]("kept_text") == "", s"doc ${i + 1}")
    }
  }

  // ---- Decontaminate.semantic: broadcast vs IVF route ----------------------

  /** Embeddings from the real testdata + a 5-vector benchmark drawn from
    * it: the IVF route (forced by maxBroadcastRows = 0) must keep exactly
    * the same survivors as the exact broadcast scan when it probes every
    * cell (nProbe = nCentroids ⇒ recall is complete by construction, so
    * this is an EQUALITY check, not a recall bound). */
  test("semantic decontam: IVF route with full probe equals the broadcast scan") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bench = emb.where(col("vec_id") % 97 === 0).select(col("embedding"))
    val exact = Decontaminate.semantic(emb, "vec_id", "embedding",
        bench, "embedding", minCosine = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Decontaminate.semantic(emb, "vec_id", "embedding",
        bench, "embedding", minCosine = 0.35,
        maxBroadcastRows = 0L, nCentroids = 4, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exact == ivf,
      s"IVF-only=${ivf.diff(exact)} exact-only=${exact.diff(ivf)}")
    assert(exact.size < emb.count(), "fixture must actually drop something")
  }

  // ---- FuzzyJoin: UTF-16 code-unit prune (ADVICE r6) -----------------------

  /** Supplementary-plane text: every 𝕏-style char is one codepoint but TWO
    * UTF-16 code units. The kernel scores in code units; the prune must
    * measure in the same unit or the derived bound is void for astral
    * input. Completeness = pruned join equals the unpruned brute force. */
  test("jaro-winkler prune: completeness holds for supplementary-plane text") {
    val rows = Seq(
      (1L, "𝕙𝕖𝕝𝕝𝕠"), // 𝕙𝕖𝕝𝕝𝕠
      (2L, "𝕙𝕖𝕝𝕝𝕠"),
      (3L, "𝕙𝕖𝕝𝕝𝕡"), // last differs
      (4L, "hello"),
      (5L, "𝕙x"),
      (6L, "completely different words")
    ).toDF("id", "t")
    import graft.functions.TextFunctions.jaroWinkler
    val minSim = 0.85
    val brute = rows.select(col("id").as("a"), col("t").as("ta"))
      .where(col("a") === 1L)
      .crossJoin(rows.select(col("id").as("b"), col("t").as("tb")))
      .where(col("a") =!= col("b"))
      .withColumn("jw", jaroWinkler(col("ta"), col("tb")))
      .where(col("jw") >= minSim)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = FuzzyJoin.jaroWinklerForQueries(rows, "id", "t",
        col("id") === 1L, minSim)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == brute, s"pruned=$pruned brute=$brute")
    assert(brute.nonEmpty, "fixture must produce matches")
  }

  // ---- epochUpsample: threshold quantization (ADVICE r6) -------------------

  /** Weight 1.1 in doubles yields frac·10000 = 1000.0000000000009 — the old
    * raw comparison admitted bucket 1000, one extra. With the half-up
    * rounded threshold exactly buckets 0..999 get the fractional copy. */
  test("epochUpsample: non-representable weight admits exactly round(frac*10000) buckets") {
    val rows = (0 until 10000).map(b => (b.toLong, "s", b.toLong)).toDF("id", "src", "b")
    val out = Sampling.epochUpsampleBy(rows, col("b"), "src",
      weights = Map("s" -> 1.1))
    assert(out.count() == 10000L + 1000L)
    val extras = out.groupBy("id").agg(count(lit(1)).as("n"))
      .where(col("n") === 2).agg(max(col("id"))).collect()(0).getLong(0)
    assert(extras == 999L, s"highest double-copied bucket must be 999, got $extras")
  }

  // ---- PageRank: staged deep-run barrier ----------------------------------

  /** pageRankStaged's persist barrier is a pure materialization point —
    * ranks must be bit-identical to the pure-lineage form, and the
    * release hook must drop the retained cache (the d5 10× lesson applied
    * to the other iterative operator). */
  test("pageRankStaged with barriers equals pure-lineage pageRank; release drops cache") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L), (5L, 1L))
      .toDF("s", "d")
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pure = ranks(graft.operators.PageRank.pageRank(e, "s", "d",
      iterations = 7))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val staged = graft.operators.PageRank.pageRankStaged(e, "s", "d",
      iterations = 7, persistEvery = 2)
    val viaBarrier = ranks(staged.df)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).size == 1,
      "exactly one barrier cache retained while the result is live")
    staged.release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "release must drop the barrier")
    assert(viaBarrier.keySet == pure.keySet)
    for ((k, v) <- pure)
      assert(viaBarrier(k) == v, s"node $k: ${viaBarrier(k)} != $v")
  }

  // ---- Sparse random projection (JL dimension reduction) -------------------

  test("sparse random projection: deterministic, norm-preserving in expectation, SQL-reachable") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val proj = graft.operators.Projection.sparseRandomProject(
      emb, "vec_id", "embedding", outDim = 16, seed = 42L)
    val a = proj.orderBy("vec_id").collect()
    assert(a.forall(_.getSeq[Double](1).length == 16), "outDim respected")
    // determinism across partitionings (zero-shuffle projection, so any
    // divergence would be a sign-matrix nondeterminism bug)
    val b = graft.operators.Projection.sparseRandomProject(
        emb.repartition(7), "vec_id", "embedding", outDim = 16, seed = 42L)
      .orderBy("vec_id").collect()
    assert(a.map(_.getSeq[Double](1)).toSeq == b.map(_.getSeq[Double](1)).toSeq,
      "bit-identical across partitionings")
    // E[#y#^2] = #x#^2 under Achlioptas scaling: the MEAN ratio over 500
    // vectors concentrates tightly even at outDim 16
    import graft.functions.VectorFunctions.dot
    val ratios = emb.select(col("vec_id"),
        dot(col("embedding"), col("embedding")).as("n2"))
      .join(proj.select(col("vec_id"),
        dot(col("projected"), col("projected")).as("p2")), "vec_id")
      .agg(avg(col("p2") / col("n2"))).head().getDouble(0)
    assert(ratios > 0.8 && ratios < 1.2,
      s"mean squared-norm ratio $ratios outside [0.8, 1.2]")
    // SQL parity: the registered function is the same kernel
    GraftExtensions.register(spark)
    emb.limit(5).createOrReplaceTempView("rp_emb")
    val viaSql = spark.sql(
      "SELECT sparse_random_project(embedding, 16, 42) AS p FROM rp_emb ORDER BY vec_id")
      .collect().map(_.getSeq[Double](0))
    val direct = graft.operators.Projection.sparseRandomProject(
        emb.limit(5), "vec_id", "embedding", outDim = 16, seed = 42L)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(viaSql.toSeq == direct.toSeq, "SQL function matches the Column form")
  }

  test("sparse random projection: pairwise distances survive 64->16 (JL bound)") {
    // The JL statement is about DISTANCES, not neighbor ranks — the
    // testdata embeddings are near-uniform random, so their pairwise
    // distances are near-ties and top-k membership is inherently
    // rank-unstable under any projection (recall measured ~0.16, barely
    // above the 0.10 chance line; that is a property of the data, not a
    // bug). The preserved quantity: mean relative squared-distance error
    // over all pairs of the first 60 vectors — measured 0.431 for this
    // fixed seed (independent-pair theory ~2+/sqrt(k) = 0.35-0.45 at
    // k=16 with sparse signs). Deterministic pin at < 0.5.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("vec_id") < 60)
    val proj = graft.operators.Projection.sparseRandomProject(
      emb, "vec_id", "embedding", outDim = 16, seed = 42L)
    import graft.functions.VectorFunctions.euclidean
    val o = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("vb")),
        col("a") < col("b"))
      .select(col("a"), col("b"),
        pow(euclidean(col("va"), col("vb")), 2).as("d2o"))
    val p = proj.select(col("vec_id").as("a"), col("projected").as("pa"))
      .join(proj.select(col("vec_id").as("b"), col("projected").as("pb")),
        col("a") < col("b"))
      .select(col("a"), col("b"),
        pow(euclidean(col("pa"), col("pb")), 2).as("d2p"))
    val meanRelErr = o.join(p, Seq("a", "b"))
      .agg(avg(abs(col("d2p") / col("d2o") - 1.0))).head().getDouble(0)
    assert(meanRelErr < 0.5,
      s"mean relative squared-distance error $meanRelErr >= 0.5")
  }

  // ---- Pseudonymization (consistent surrogates) ----------------------------

  test("pseudonymizeEmails: corpus-wide consistency, distinct surrogates, non-PII untouched") {
    import graft.functions.TextFunctions.pseudonymizeEmails
    val df = Seq(
      (1L, "mail a@x.com now"),
      (2L, "again a@x.com and b@y.org"),
      (3L, "no pii here, not even half@way")).toDF("id", "t")
    val out = df.select(col("id"), pseudonymizeEmails(col("t")).as("p"))
      .orderBy("id").collect().map(_.getString(1))
    val tokRe = "user_\\d+@redacted\\.example".r
    val t1 = tokRe.findFirstIn(out(0)).get
    val row2 = tokRe.findAllIn(out(1)).toSeq
    assert(row2.size == 2, s"two addresses pseudonymized: ${out(1)}")
    assert(row2.head == t1, "same address must map to the same surrogate everywhere")
    assert(row2(1) != t1, "different addresses must get different surrogates")
    assert(out(0) == s"mail $t1 now", "surrounding text untouched")
    assert(out(2) == "no pii here, not even half@way",
      "non-address text (no TLD) must pass through verbatim")
  }

  // ---- Typed Aggregator (SURVEY §2.9 bucket 4) -----------------------------

  test("TopKByScore: equals the window form, buffers stay k-bounded, plans object aggregation") {
    import graft.functions.Aggregators.{Scored, TopKByScore}
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val typed = cust
      .select(col("c_nationkey").cast("long").as("_1"),
        col("c_custkey").as("_2"), col("c_acctbal").as("_3"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(new TopKByScore(3).toColumn.name("top"))
    // plan: typed agg goes through partial+final ObjectHashAggregate /
    // SortAggregate — the map-side combine that carries <= k items per
    // key per task into the shuffle
    val planStr = typed.queryExecution.executedPlan.toString
    assert(planStr.contains("Aggregate"), s"expected an aggregate plan:\n$planStr")
    val viaAgg = typed.collect().flatMap { case (nation, tops) =>
      tops.zipWithIndex.map { case (s, i) => (nation, i + 1, s.id, s.score) }
    }.toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val viaWindow = cust
      .select(col("c_nationkey").cast("long").as("n"), col("c_custkey"),
        col("c_acctbal"), row_number().over(w).as("rnk"))
      .where(col("rnk") <= 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1),
        r.getDouble(2))).toSet
    assert(viaAgg == viaWindow, "typed Aggregator must equal the window form")
    // reduce keeps the running buffer bounded at k (the partial-agg
    // shuffle bound)
    val a = new TopKByScore(2)
    val grown = (1 to 10).foldLeft(a.zero)((b, i) => a.reduce(b, Scored(i.toLong, i.toDouble)))
    assert(grown.length == 2 && grown.map(_.id).toSet == Set(9L, 10L))
  }

  // ---- Persisted IVF index (build once, query many) ------------------------

  test("IVF index: full-probe query equals brute force; partial probe is a subset; no retrain on reuse") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.operators.Ann.buildIvfIndex(emb, "vec_id", "embedding", dir,
      nCentroids = 8, seed = 42L)
    // layout: centroids + cell-partitioned postings (partition pruning is
    // what makes a partial probe read a fraction of the corpus bytes),
    // inside the generation dir the CURRENT pointer resolves to (r11)
    val gdir = graft.operators.Ann.resolveIvfDir(spark, dir)
    val cellDirs = new java.io.File(s"$gdir/postings.parquet")
      .listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "postings must be partitioned by home cell")
    val queries = emb.where(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("c"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    val viaIndex = rows(graft.operators.Ann.queryIvfIndex(
      queries, "vec_id", "embedding", dir, k = 5, nProbe = 8))
    val brute = rows(graft.operators.Ann.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 5))
    assert(viaIndex == brute, "full probe must be exactly brute force")
    // partial probe: at most k per query, every hit is a true pair from
    // the full ranking's candidate set, deterministic across runs
    val p1 = rows(graft.operators.Ann.queryIvfIndex(
      queries, "vec_id", "embedding", dir, k = 5, nProbe = 2))
    val p2 = rows(graft.operators.Ann.queryIvfIndex(
      queries, "vec_id", "embedding", dir, k = 5, nProbe = 2))
    assert(p1 == p2, "index queries must be deterministic")
    val bruteAll = rows(graft.operators.Ann.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 499))
    assert(p1.forall { case (q, n, c, _) =>
      bruteAll.exists(t => t._1 == q && t._2 == n && t._3 == c) },
      "partial-probe cosines must match the exact scores")
  }

  test("queryIvfIndex: the postings scan is dynamically partition-pruned to the probed cells") {
    // The layout claim, pinned: because postings are PARTITIONED BY home
    // cell and the probe side joins on cell, Spark injects a
    // dynamicpruning expression into the postings FileScan — a partial
    // probe physically reads only the probed cells' files, which is the
    // whole point of the persisted-index layout at 100 TB.
    val dir = java.nio.file.Files.createTempDirectory("ivfdpp").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.operators.Ann.buildIvfIndex(emb, "vec_id", "embedding", dir,
      nCentroids = 8, seed = 42L)
    val q = graft.operators.Ann.queryIvfIndex(
      emb.where(col("vec_id") < 5), "vec_id", "embedding", dir,
      k = 3, nProbe = 2)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    // the explain string truncates Location paths at ~100 chars, and the
    // r11 generation dir (gen-<uuid>) pushes ".../postings.parquet" past
    // the cutoff — identify the index scans by the index ROOT dir name
    // instead; the postings scan is the only PARTITIONED one, so any
    // dynamicpruning on an index scan is it (centroids has no partitions)
    val idxName = new java.io.File(dir).getName
    val idxScanLines = plan.split("\n")
      .filter(l => l.contains("FileScan") && l.contains(idxName))
    assert(idxScanLines.nonEmpty, s"index scans not found:\n$plan")
    assert(idxScanLines.exists(_.contains("dynamicpruning")),
      "postings scan must carry a dynamicpruning partition filter on cell; " +
        s"got:\n${idxScanLines.mkString("\n")}")
  }

  test("streaming ANN serve: micro-batches query the persisted IVF index (stream-static)") {
    // The serving composition the index exists for: the corpus-sized work
    // happened at BUILD time; each micro-batch of query ids only reads
    // the centroid table + its probed posting partitions. Full probe here
    // so the streamed answers are checkable against brute force.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("ivfserve").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.operators.Ann.buildIvfIndex(emb, "vec_id", "embedding", dir,
      nCentroids = 8, seed = 42L)
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Int)]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDS.toDF("vec_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val withVecs = batch.join(emb, "vec_id")
        val hits = graft.operators.Ann.queryIvfIndex(
            withVecs, "vec_id", "embedding", dir, k = 3, nProbe = 8)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1),
            r.getDouble(2), r.getInt(3)))
        results.synchronized { results ++= hits }
        ()
      }
      .start()
    try {
      input.addData(1L, 2L)
      q.processAllAvailable()
      input.addData(3L)
      q.processAllAvailable()
    } finally q.stop()
    val brute = graft.operators.Ann.bruteForceTopK(
        emb.where(col("vec_id").isin(1L, 2L, 3L)), emb,
        "vec_id", "embedding", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(results.toSet == brute,
      s"streamed index answers must equal brute force; got ${results.size} rows")
    assert(results.size == 9, "3 queries x k=3 across two micro-batches")
  }

  // ---- Multi-source BFS distances ------------------------------------------

  test("bfsDistances: hand-checkable chain + early exit past the last frontier") {
    // 1 -> 2 -> 3 -> 4 -> 5 and an unreachable island 10 -> 11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val sources = Seq(1L).toDF("id")
    val out = graft.operators.Graph.bfsDistances(
        edges, "src", "dst", sources, "id", maxHops = 10)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)),
      s"got ${out.toSeq}")
  }

  test("bfsDistances: min distance wins when frontiers overlap (diamond)") {
    // two sources, diamond: 1->3 (dist 1), 2->3 (dist 1), 3->4; plus a
    // long way around 1->5->6->4 — 4 must settle at 2 (via 3), not 3
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 6L), (6L, 4L))
      .toDF("src", "dst")
    val sources = Seq(1L, 2L).toDF("id")
    val out = graft.operators.Graph.bfsDistances(
        edges, "src", "dst", sources, "id", maxHops = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 1L, 6L -> 2L))
  }

  test("semantic decontam: empty benchmark keeps the whole corpus on both routes") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val none = emb.where(lit(false)).select(col("embedding"))
    for (mbr <- Seq(2000000L, 0L)) {
      val out = Decontaminate.semantic(emb, "vec_id", "embedding",
        none, "embedding", minCosine = 0.35, maxBroadcastRows = mbr)
      assert(out.count() == emb.count())
    }
  }
}
