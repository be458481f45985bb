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
