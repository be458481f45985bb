package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * plus one partial+final aggregation on `dst`. Iterations compose as
  * lineage; the iteration count is bounded (<= 20) because a production
  * run at web scale persists each iteration's ranks and unpersists the
  * previous (caller-owned), while a gate query's 3-5 iterations are
  * cheaper as one pipelined DAG. */
object PageRank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20] (got $iterations) — persist per " +
        "iteration beyond that instead of growing lineage")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1) (got $damping)")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val outd = e.groupBy("src").agg(count(lit(1)).cast("double").as("outd"))
    val n = nodes.agg(count(lit(1)).cast("double").as("n"))
    var pr = nodes.crossJoin(broadcast(n))
      .select(col("v"), (lit(1.0) / col("n")).as("pr"))
    for (_ <- 1 to iterations) {
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
    }
    pr
  }
}
