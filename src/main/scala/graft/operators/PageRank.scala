package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over an edge list — the classic link-graph
  * quality signal (Page/Brin): a training-data pipeline runs it over a
  * web-crawl's link graph to weight or filter documents by connectivity
  * (the "quality signals" channel of CommonCrawl-scale curation).
  *
  * Semantics (documented precisely so a SQL oracle can unroll them):
  *   nodes      = distinct(src) ∪ distinct(dst), N = |nodes|
  *   pr_0(v)    = 1/N
  *   pr_i+1(v)  = (1-d)/N + d * Σ_{u→v} pr_i(u) / out(u)
  * Dangling-node mass (out(u) = 0) is dropped, not redistributed — the
  * simplified variant; Σ pr < 1 when dangling nodes exist.
  *
  * Spark-first shape: each iteration is one join of the edge list with the
  * current ranks on `src` (co-partitioned with the out-degree join — a
  * single shuffle establishes the src partitioning once AQE reuses it)
  * plus one partial+final aggregation on `dst`. [[pageRank]] composes
  * iterations as pure lineage — a gate query's 3-5 iterations are cheaper
  * as one pipelined DAG, and the <= 20 bound keeps the (linearly growing)
  * plan small. [[pageRankStaged]] is the deep-run production shape:
  * every `persistEvery`-th iteration persists + materializes the ranks
  * and CUTS the plan to a LogicalRDD (persist alone does not truncate the
  * analyzed plan — the d5 10× lesson, SCALING.md), releasing the previous
  * barrier; results are bit-identical (a barrier is a pure
  * materialization point). */
object PageRank {

  /** Pure-lineage form; iteration count bounded to keep the plan small. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20] (got $iterations) — use " +
        "pageRankStaged with persistEvery for deeper runs")
    run(edges, srcCol, dstCol, iterations, damping, persistEvery = 0).df
  }

  /** Deep-run form: plan-cutting persist barrier every `persistEvery`
    * iterations; call `release()` after the last downstream action. */
  def pageRankStaged(edges: DataFrame, srcCol: String, dstCol: String,
                     iterations: Int, damping: Double = 0.85,
                     persistEvery: Int = 5): Dedup.Staged = {
    require(iterations >= 1, s"iterations must be >= 1 (got $iterations)")
    require(persistEvery >= 1,
      s"persistEvery must be >= 1 (got $persistEvery)")
    run(edges, srcCol, dstCol, iterations, damping, persistEvery)
  }

  private def run(edges: DataFrame, srcCol: String, dstCol: String,
                  iterations: Int, damping: Double,
                  persistEvery: Int): Dedup.Staged = {
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1) (got $damping)")
    val spark = edges.sparkSession
    // Persist the three iteration-invariant frames ONCE (r14): every
    // iteration's subtree references e twice (contrib join + outd) and
    // nodes once, and without a materialization point each reference
    // re-executes the caller's edge DERIVATION — for the g1 gate that is
    // the orders⋈lineitem join, re-run ~11 times over 3 iterations
    // (88 parquet scans in the audited plan). Eager MEMORY_AND_DISK
    // persists (the bfsDistances/connectedComponents contract — lineage
    // kept, spills to disk, caller-owned release via the Staged hook;
    // Bench clears the session cache per run, so every timed run still
    // computes from parquet). Results are bit-identical: a persist is a
    // pure materialization point.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outd = e.groupBy("src").agg(count(lit(1)).cast("double").as("outd"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.agg(count(lit(1)).cast("double").as("n"))
    var pr = nodes.crossJoin(broadcast(n))
      .select(col("v"), (lit(1.0) / col("n")).as("pr"))
    var barrier: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      val contrib = e
        .join(pr.withColumnRenamed("v", "src"), "src")
        .join(outd, "src")
        .select(col("dst").as("v"), (col("pr") / col("outd")).as("w"))
        .groupBy("v").agg(sum(col("w")).as("c"))
      pr = nodes.crossJoin(broadcast(n))
        .join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("pr"))
      if (persistEvery > 0 && i % persistEvery == 0 && i < iterations) {
        val cached = pr.persist(StorageLevel.MEMORY_AND_DISK)
        cached.count()
        pr = spark.createDataFrame(cached.rdd, cached.schema)
        barrier.foreach(_.unpersist())
        barrier = Some(cached)
      }
    }
    val retained = barrier
    Dedup.Staged(pr, () => {
      retained.foreach(_.unpersist())
      e.unpersist(); nodes.unpersist(); outd.unpersist(); ()
    })
  }
}
