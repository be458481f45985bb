package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: materialize every period inside each key's
  * observed range (the scaffold) and carry the last observation forward
  * through the gaps — the feature-engineering step that turns sparse event
  * dates into the dense per-day series window models and as-of features
  * expect.
  *
  * Spark-first shape, per key bounded: the scaffold is built per key from
  * its own [min, max] range (one partial+final aggregate, then a
  * `sequence` explode — map-side, no shuffle), joined back on (key, date)
  * (one shuffle), and the carry-forward is `last(ignoreNulls)` over a
  * per-key running window (one shuffle on the key). No global time axis is
  * ever materialized — each key pays only for its own span, so a 100 TB
  * event log with short-lived keys stays linear.
  */
object Resample {

  /** Gap-fill `df` to one row per (`keyCol`, day): days between each key's
    * first and last observation that have no row get the most recent
    * earlier value of `valueCol` (the carry-forward), flagged
    * `was_gap = 1`. Input must be unique per (key, day) — pre-aggregate
    * multi-event days first (as the gate query does with a count).
    *
    * Output columns: keyCol, `day` (date), `<valueCol>_filled`, `was_gap`.
    * The first scaffold row per key is never a gap (the range starts at an
    * observation), so the carry-forward never reads before the window. */
  def gapFillDaily(df: DataFrame, keyCol: String, dateCol: String,
                   valueCol: String): DataFrame = {
    val obs = df.select(col(keyCol), col(dateCol).cast("date").as("day"),
      col(valueCol))
    val ranges = obs.groupBy(col(keyCol))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val scaffold = ranges.select(col(keyCol),
      explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold.join(obs, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col(valueCol), ignoreNulls = true).over(w)
          .as(s"${valueCol}_filled"),
        when(col(valueCol).isNull, 1L).otherwise(0L).as("was_gap"))
  }

  /** The generic form: any period length via `step` (a Column interval,
    * e.g. `expr("INTERVAL 1 HOUR")`) over a timestamp column, for callers
    * whose series are not daily. Same plan shape and contract as
    * [[gapFillDaily]].
    *
    * PRECONDITION — grid alignment: every observation's `tsCol` must lie
    * ON its key's step grid (the sequence lo, lo+step, lo+2*step, …
    * anchored at that key's earliest observation). The scaffold join is an
    * exact equality, so a misaligned row (00:30 against an hourly grid
    * from 00:00) would neither appear in the output nor be carried
    * forward. Rather than lose it silently, the plan FAILS FAST: the join
    * is full-outer with a scaffold-side marker, and any observation row
    * that missed the grid raises a descriptive error at execution time
    * (zero cost when all rows align — the error branch never evaluates).
    * Truncate timestamps to the grid (`date_trunc`) before calling if the
    * data is not already aligned. */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, step: Column): DataFrame = {
    val obs = df.select(col(keyCol), col(tsCol).as("period"), col(valueCol))
    val ranges = obs.groupBy(col(keyCol))
      .agg(min(col("period")).as("lo"), max(col("period")).as("hi"))
    val scaffold = ranges.select(col(keyCol),
      explode(sequence(col("lo"), col("hi"), step)).as("period"))
      .withColumn("__on_grid", lit(1))
    val w = Window.partitionBy(keyCol).orderBy("period")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold.join(obs, Seq(keyCol, "period"), "full_outer")
      .withColumn("__filled",
        last(col(valueCol), ignoreNulls = true).over(w))
      .select(col(keyCol), col("period"),
        when(col("__on_grid").isNull,
          raise_error(format_string(
            "gapFill: observation at %s for key %s is not aligned to its " +
              "key's step grid — truncate tsCol to the grid (date_trunc) " +
              "before gap-filling",
            col("period").cast("string"), col(keyCol).cast("string"))))
          .otherwise(col("__filled"))
          .as(s"${valueCol}_filled"),
        when(col(valueCol).isNull, 1L).otherwise(0L).as("was_gap"))
  }
}
