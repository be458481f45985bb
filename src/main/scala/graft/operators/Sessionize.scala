package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch/window form of what Structured
  * Streaming's `session_window` computes incrementally, and the event
  * analytic a training-data pipeline runs to filter bot traffic / derive
  * engagement features from a click log.
  *
  * Shape: one window partitioned by user ordered by (ts, tiebreak) — the
  * lag-gap flag and the running session counter share the same window
  * spec, so Catalyst plans ONE Window operator over ONE shuffle on the
  * user key. At 100 TB the only knob that matters is that the partition
  * key is the user (bounded per-user history), never time.
  */
object Sessionize {

  /** Adds a `session_id` column (0-based per user): a new session starts
    * when the gap since the previous event exceeds `gap` (same units as
    * `tsCol`). `tieBreak` makes the order total for equal timestamps. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gap: Long, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), tieBreak)
    val newSession = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > gap ||
        lag(col(tsCol), 1).over(w).isNull, 1L).otherwise(0L)
    events.withColumn("session_id", sum(newSession).over(w) - 1L)
  }

  /** Per-user session stats: session count, total events, longest session
    * duration (in `tsCol` units integer-divided by `durUnit`). */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   gap: Long, tieBreak: Column,
                   durUnit: Long = 1L): DataFrame = {
    val s = sessionize(events, userCol, tsCol, gap, tieBreak)
    val perSession = s.groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        ((max(col(tsCol)) - min(col(tsCol))) / durUnit).cast("long").as("dur"))
    perSession.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        max(col("dur")).as("max_dur"))
  }
}
