package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting/sampling for training pipelines.
  *
  * `sample(fraction)` is row-count random and changes membership on every
  * partitioning change; training splits need the OPPOSITE: membership
  * that is a pure function of the document id (stable across runs,
  * clusters, and re-partitions, and join-free to reproduce anywhere).
  * Standard technique: bucket the id hash into [0, 100) and assign
  * buckets to splits by cumulative fraction.
  */
object Sampling {

  /** Adds a `split` column: id-hash bucket assigned by cumulative
    * fractions (e.g. Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).
    * Fractions must sum to ~1; every row lands in exactly one split. */
  def hashSplit(df: DataFrame, idCol: String, seed: Long,
                fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1 (got $fractions)")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(10000L))
    // cumulative upper bounds in buckets-of-1/10000 (rounding to the last
    // split keeps the cover exhaustive)
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => math.round(c * 10000).toInt)
    val expr = fractions.map(_._1).zip(bounds).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, (name, hi)) =>
        when(bucket < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }
}
