package graft

import org.apache.spark.sql.functions._

/** Round-11 pins: the IVF assignment shuffle sizing (the last heavy entry
  * points running at the fixed session setting — buildIvfIndex's posting
  * build and Decontaminate's above-threshold IVF route) follows the r10
  * Tuning contract: floor = session setting (gate plans untouched), sizing
  * engages only when input stats demand it, results partition-invariant. */
class Round11Spec extends SparkSuite {

  // count shuffle exchanges in the final physical plan (sparkPlan is
  // pre-EnsureRequirements — it carries none; the explain string shows
  // the post-preparation plan even under AQE)
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r.findAllIn(
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))).size

  test("ivfThresholdHits sizing: no-op at gate scale, in-plan repartition replacing (not adding) the window exchange when forced") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.where(col("vec_id") < 300)
    val bench = emb.where(col("vec_id") >= 300 && col("vec_id") < 360)
      .select(col("embedding"))
    def hits() = graft.operators.Ann.ivfThresholdHits(
      corpus, "vec_id", "embedding", bench, "embedding",
      minCosine = 0.8, nCentroids = 4, nProbe = 4)
    // gate scale: the estimate stays under the session floor, so the plan
    // carries NO repartition — byte-identical to the pre-r11 form
    val unsized = hits()
    assert(!unsized.queryExecution.optimizedPlan.toString
        .contains("RepartitionByExpression"),
      "sizing engaged at gate scale — gate plans must be untouched")
    val n0 = exchanges(unsized)
    val r0 = unsized.collect().map(_.getLong(0)).toSet
    // forced engagement via the ops override: tiny target bytes make this
    // corpus "large" without a 50x fixture in a spec
    System.setProperty("graft.tuning.targetPartitionBytes", "1024")
    try {
      val sized = hits()
      val plan = sized.queryExecution.optimizedPlan.toString
      assert(plan.contains("RepartitionByExpression"),
        s"override failed to force the sizing:\n$plan")
      // the repartition must REPLACE the window's exchange (same key, so
      // the window reuses the partitioning), never stack a second one
      assert(exchanges(sized) == n0,
        s"sized plan has ${exchanges(sized)} exchanges vs $n0 unsized — " +
          "the repartition stacked instead of replacing")
      // and the hit set is partition-count-invariant
      assert(sized.collect().map(_.getLong(0)).toSet == r0,
        "hits changed with partition sizing")
    } finally System.clearProperty("graft.tuning.targetPartitionBytes")
  }

  test("compactIvfIndex folds shards into a clean base generation with identical results") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ivfcompact").toString
    graft.operators.Ann.buildIvfIndex(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", dir, nCentroids = 8, seed = 42L)
    assert(graft.operators.Ann.appendIvfShard(
      emb.where(col("vec_id") >= 300 && col("vec_id") < 450),
      "vec_id", "embedding", dir) == 1)
    assert(graft.operators.Ann.appendIvfShard(
      emb.where(col("vec_id") >= 450), "vec_id", "embedding", dir) == 2)
    val queries = emb.where(col("vec_id") < 10)
    def served() = graft.operators.Ann.queryIvfIndex(
        queries, "vec_id", "embedding", dir, k = 5, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("c"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val before = served()
    val total = emb.count()
    assert(graft.operators.Ann.compactIvfIndex(spark, dir) == total)
    // results bit-identical: compaction is a relayout, not a re-assignment
    assert(served() == before, "compaction changed query results")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // the shard dirs and the old generation's markers are gone — resolve
    // AFTER the compact: it flipped CURRENT to a fresh generation dir
    val gdir = graft.operators.Ann.resolveIvfDir(spark, dir)
    val shardDirs = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$gdir/postings.parquet/cell=*/shard=*")).map(_.getPath.getName).toSet
    assert(shardDirs == Set("shard=0"), s"non-base shards survive: $shardDirs")
    val markers = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$gdir/postings.parquet")).map(_.getPath.getName)
      .filter(n => n.startsWith("_SHARD_"))
    assert(markers.isEmpty, s"old-generation markers survive: ${markers.toSeq}")
    // the append loop restarts cleanly on the new generation
    assert(graft.operators.Ann.appendIvfShard(
      emb.where(col("vec_id") < 20)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")),
      "vec_id", "embedding", dir) == 1)
    assert(served().nonEmpty)
  }

  test("buildIvfIndex/appendIvfShard sizing: forced engagement leaves query results identical") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.where(col("vec_id") < 300)
    val delta = emb.where(col("vec_id") >= 300 && col("vec_id") < 400)
    val queries = emb.where(col("vec_id") < 10)
    def served(dir: String) = graft.operators.Ann.queryIvfIndex(
        queries, "vec_id", "embedding", dir, k = 5, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("c"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val dirA = java.nio.file.Files.createTempDirectory("ivfsizeA").toString
    graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dirA,
      nCentroids = 4, seed = 42L)
    assert(graft.operators.Ann.appendIvfShard(
      delta, "vec_id", "embedding", dirA) == 1)
    val expect = served(dirA)
    System.setProperty("graft.tuning.targetPartitionBytes", "1024")
    try {
      val dirB = java.nio.file.Files.createTempDirectory("ivfsizeB").toString
      graft.operators.Ann.buildIvfIndex(base, "vec_id", "embedding", dirB,
        nCentroids = 4, seed = 42L)
      assert(graft.operators.Ann.appendIvfShard(
        delta, "vec_id", "embedding", dirB) == 1)
      assert(served(dirB) == expect,
        "IVF results changed under forced assignment sizing")
    } finally System.clearProperty("graft.tuning.targetPartitionBytes")
  }
}
