package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the event-enrichment primitive (clicks
  * joined to the impressions that caused them, acks to requests, payments
  * to orders) the reference's per-event loop cannot express but a 100 TB
  * event pipeline needs constantly.
  *
  * Spark-first shape: BOTH sides carry event-time watermarks and the join
  * condition bounds the right timestamp to a window around the left one —
  * exactly the two ingredients Structured Streaming needs to know when
  * buffered join state is safe to evict (right rows older than
  * left-watermark − `before`, left rows older than right-watermark −
  * `after`). Without the time bound the state store grows without limit;
  * with it, state per key is O(events within the interval), independent of
  * stream lifetime.
  */
object StreamJoin {

  /** Inner-join `left` and `right` on `key`, keeping (l, r) pairs whose
    * event times satisfy `r.ts ∈ [l.ts − before, l.ts + after]`. `watermark`
    * (e.g. "10 seconds") is the lateness bound applied to both sides;
    * `before`/`after` are SQL interval strings (e.g. "5 minutes").
    *
    * Output columns: the key, both timestamps (`leftTs`, `rightTs`), and
    * all remaining columns of both inputs — which must therefore not
    * collide; rename upstream. Works identically on two static frames
    * (the batch backtest of the same pipeline). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   watermark: String, before: String,
                   after: String): DataFrame =
    joinImpl(left, right, key, leftTs, rightTs, watermark, before, after,
      "inner")

  /** LEFT OUTER [[intervalJoin]]: left events with NO right match inside
    * the window surface with null right columns — but only once the
    * watermark has passed the window's end, when "no match yet" provably
    * means "no match ever". The negative-label miner: impressions without
    * a click inside the attribution window ARE the negative training
    * examples, and a pipeline that only inner-joins silently loses them. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            watermark: String, before: String,
                            after: String): DataFrame =
    joinImpl(left, right, key, leftTs, rightTs, watermark, before, after,
      "left_outer")

  /** FULL OUTER [[intervalJoin]]: unmatched rows from BOTH sides surface
    * with nulls once the watermark proves no match can arrive — the
    * reconciliation shape (orders vs payments: unpaid orders AND orphan
    * payments in one pass). Same state bounds as the other variants. */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            watermark: String, before: String,
                            after: String): DataFrame =
    joinImpl(left, right, key, leftTs, rightTs, watermark, before, after,
      "full_outer")

  private def joinImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String, watermark: String,
                       before: String, after: String,
                       joinType: String): DataFrame = {
    require(leftTs != rightTs,
      "leftTs and rightTs must be distinct column names (rename upstream)")
    val l = left.withWatermark(leftTs, watermark).alias("l")
    // rename the right key pre-join: the output key must come from the
    // surviving side, and in the full-outer case from COALESCE of both
    // (dropping r.key outright would null the key on right-only rows)
    val r = right.withColumnRenamed(key, "__rkey")
      .withWatermark(rightTs, watermark).alias("r")
    val joined = l.join(r,
      col(s"l.$key") === col("__rkey") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $before") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $after"),
      joinType)
    joinType match {
      case "full_outer" =>
        joined.withColumn("__k", coalesce(col(s"l.$key"), col("__rkey")))
          .drop(key).drop("__rkey").withColumnRenamed("__k", key)
      case _ => joined.drop("__rkey")
    }
  }
}
