package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
  * combine a lexical (BM25) and a dense (embedding-cosine) retrieval leg
  * without score calibration: fused(d) = Σ_legs 1 / (k + rank_leg(d)).
  *
  * Implemented as union + one aggregation rather than an n-way outer
  * join: legs are top-N lists (bounded), absent ranks contribute nothing,
  * and the shape stays two narrow scans + one shuffle on the id no matter
  * how many legs fuse. */
object Fusion {

  /** Each leg: (idCol, rankCol) with 1-based ranks. Returns (idCol, rrf)
    * — callers order/limit downstream. */
  def rrf(legs: Seq[DataFrame], idCol: String, rankCol: String,
          k: Int = 60): DataFrame = {
    require(legs.nonEmpty, "at least one leg required")
    require(k >= 1, s"k must be >= 1 (got $k)")
    legs.map(df => df.select(col(idCol),
        (lit(1.0) / (lit(k) + col(rankCol))).as("contrib")))
      .reduce(_ unionByName _)
      .groupBy(idCol).agg(sum(col("contrib")).as("rrf"))
  }
}
