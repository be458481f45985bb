package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group min-max bucket weighting (SURVEY §2.4 A2).
  *
  * The reference normalizes each book's per-tag counts into an integer weight
  * in {1..4} with `ceil((n + 0.1 - min) * 4 / (max + 0.1 - min))`, where
  * min/max are taken over the book's own tag counts
  * (reference: recommender-offline/simility_books/simility_books.py:38,
  * recommender-online/u_like/guessLike_u_like.py:51,
  * recommender-offline/log_analysis/log_analyze.py:103-104).
  * The `+0.1` keeps the denominator non-zero when min == max (all weights
  * land in bucket 4 in that case, matching the reference exactly).
  *
  * Spark-first form: two window aggregates (map-side partial min/max are not
  * available for windows, but this is a single shuffle on the group key that
  * Catalyst shares between the min and the max — one Exchange, one Window
  * node), then a pure-codegen arithmetic projection. No UDF, no UDAF.
  */
object Weighting {

  /** The bucket expression itself, usable on any numeric column once the
    * per-group `min`/`max` columns exist. Buckets ∈ {1..nBuckets}. */
  def bucketExpr(n: Column, mn: Column, mx: Column, nBuckets: Int = 4): Column =
    ceil((n + lit(0.1) - mn) * lit(nBuckets) / (mx + lit(0.1) - mn)).cast("long")

  /** Adds `bucket` to `df`, min-max bucketing `valueCol` within `groupCol`. */
  def minMaxBucket(df: DataFrame, groupCol: String, valueCol: String,
                   nBuckets: Int = 4, out: String = "bucket"): DataFrame = {
    val w = Window.partitionBy(groupCol)
    val v = col(valueCol)
    df.withColumn(out,
      bucketExpr(v, min(v).over(w), max(v).over(w), nBuckets))
  }
}
