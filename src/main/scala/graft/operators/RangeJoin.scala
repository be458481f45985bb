package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (point-in-interval): left rows with a numeric point joined
  * to right rows whose [lo, hi] interval contains it.
  *
  * Catalyst plans a bare inequality join as BroadcastNestedLoopJoin —
  * O(|left| x |right|) compares, the classic silent scale-killer. The
  * bucketed form restores an equi-join: intervals explode to every
  * bucket of width `bucketWidth` they overlap, points land in exactly
  * one bucket, the join runs on (bucket ± extra keys), and an exact
  * BETWEEN post-filter removes same-bucket near-misses. Each matching
  * pair arises in exactly one bucket (the point's), so no dedup pass is
  * needed. Cost scales with Σ interval_span/width — pick `bucketWidth`
  * near the typical interval span; `maxBucketsPerInterval` fails fast on
  * a degenerate interval that would fan out unboundedly.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double, keyCols: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    val p = points.withColumn("__b", floor(col(pointCol) / bucketWidth))
    val nBuckets =
      floor(col(hiCol) / bucketWidth) - floor(col(loCol) / bucketWidth) + 1
    // the guard lives INSIDE the exploded expression (a dropped assert
    // column would be pruned away): a degenerate interval raises with a
    // clear message instead of fanning out unboundedly
    val i = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__nb", nBuckets)
      .withColumn("__b", explode(
        when(col("__nb") <= maxBucketsPerInterval,
          sequence(floor(col(loCol) / bucketWidth).cast("long"),
            floor(col(hiCol) / bucketWidth).cast("long")))
          .otherwise(raise_error(concat(
            lit(s"range-join interval spans more than $maxBucketsPerInterval " +
              "buckets ("), col("__nb").cast("string"),
            lit(s"); widen bucketWidth=$bucketWidth"))).cast("array<long>"))))
    p.join(i, keyCols :+ "__b")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b", "__nb")
  }

  /** Interval-overlap join: (left, right) pairs whose intervals intersect
    * — `loA <= hiB AND loB <= hiA`. Same bucketed-equi-join shape as
    * [[pointInInterval]] (a bare overlap predicate plans a nested-loop
    * join); BOTH sides explode to their covered buckets. A pair sharing m
    * buckets would surface m times, so each pair is emitted ONLY from the
    * bucket containing its overlap start `max(loA, loB)` — an exact
    * filter in the same post-join conjunct, no dropDuplicates shuffle of
    * the pair set. Cost scales with Σ span/width per side; pick
    * `bucketWidth` near the typical interval span. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loA: String, hiA: String, loB: String, hiB: String,
                      bucketWidth: Double, keyCols: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame = {
      val nBuckets = floor(col(hi) / bucketWidth) - floor(col(lo) / bucketWidth) + 1
      df.where(col(lo) <= col(hi))
        .withColumn("__nb", nBuckets)
        .withColumn("__b", explode(
          when(col("__nb") <= maxBucketsPerInterval,
            sequence(floor(col(lo) / bucketWidth).cast("long"),
              floor(col(hi) / bucketWidth).cast("long")))
            .otherwise(raise_error(concat(
              lit(s"interval-overlap interval spans more than " +
                s"$maxBucketsPerInterval buckets ("), col("__nb").cast("string"),
              lit(s"); widen bucketWidth=$bucketWidth"))).cast("array<long>"))))
        .drop("__nb")
    }
    exploded(left, loA, hiA).join(exploded(right, loB, hiB), keyCols :+ "__b")
      .where(col(loA) <= col(hiB) && col(loB) <= col(hiA) &&
        floor(greatest(col(loA), col(loB)) / bucketWidth).cast("long") === col("__b"))
      .drop("__b")
  }
}
