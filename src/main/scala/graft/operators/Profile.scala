package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-distribution profiling: the audit a pipeline runs over a join/agg
  * key BEFORE committing to a physical strategy at scale. A heavy tail in
  * the histogram (or a large top-share in the summary) is the signal to
  * reach for [[Skew.saltedJoin]]/[[Skew.saltedSum]] or AQE skew handling;
  * a near-uniform profile says the plain shuffle is fine.
  *
  * Both shapes are two-level aggregations: the first groupBy shuffles on
  * the profiled key with map-side partial counts; everything after operates
  * on one row per DISTINCT key (already orders of magnitude smaller than
  * the data) and collapses to at most 64 histogram rows / one summary row.
  * Nothing here is sensitive to the skew it measures — per-key counts are
  * associative partial aggregates, so the hot key's rows combine map-side.
  */
object Profile {

  /** Per-key count histogram on log2 buckets: bucket b holds keys whose
    * row count is in [2^b, 2^(b+1)). Returns
    * (bucket, n_keys, n_rows, min_cnt, max_cnt) ordered by bucket. */
  def keyHistogram(df: DataFrame, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("__k")).agg(count(lit(1)).as("cnt"))
      .groupBy(floor(log2(col("cnt"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        min(col("cnt")).as("min_cnt"),
        max(col("cnt")).as("max_cnt"))
      .orderBy("bucket")

  /** One-row skew summary over the key's count distribution:
    * n_keys, n_rows, max/median/p99 per-key count, and the two decision
    * ratios — top1_share (hottest key's fraction of all rows) and
    * skew_ratio (max over mean; > ~4-8 with a large key count is where
    * salting starts paying for itself). */
  def skewStats(df: DataFrame, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("__k")).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"),
        round(expr("percentile(cnt, 0.5)"), 4).as("p50_cnt"),
        round(expr("percentile(cnt, 0.99)"), 4).as("p99_cnt"),
        round(max(col("cnt")).cast("double") / sum(col("cnt")), 6)
          .as("top1_share"),
        round(max(col("cnt")).cast("double") *
          count(lit(1)) / sum(col("cnt")), 4).as("skew_ratio"))
}
