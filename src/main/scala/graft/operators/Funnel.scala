package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-journey analytics over an event log: ordered-funnel conversion and
  * cohort retention — the product-analytics queries every event pipeline
  * serves, expressed as plain aggregate/join plans.
  *
  * Scale shape: every step is keyed on the user id. The funnel's stage
  * frames shrink monotonically (stage i+1 users ⊆ stage i users), so each
  * successive join is smaller than the last and AQE broadcasts the tail
  * stages; cohort retention is two user-keyed aggregates and one join.
  * Nothing collects to the driver.
  */
object Funnel {

  /** Ordered-funnel conversion counts: stage 0 counts users with any
    * `stages(0)` event; stage i counts users with a `stages(i)` event
    * STRICTLY AFTER their earliest qualifying stage i−1 event (the
    * standard min-time forward-chaining semantics — each user converts at
    * most once per stage, out-of-order events don't count).
    *
    * `tsCol` must be totally ordered (any numeric/timestamp). Output:
    * (stage_idx: long, stage: string, n_users: long), one row per stage,
    * in one action (the per-stage aggregates union into a single plan). */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct (got $stages)")
    val stageTimes = funnelStageTimes(events, userCol, typeCol, tsCol, stages)
    stageTimes.zipWithIndex.map { case (st, i) =>
      st.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_idx"), lit(stages(i)).as("stage"),
          col("n_users"))
    }.reduce(_ union _).orderBy("stage_idx")
  }

  /** The per-user stage conversion times behind [[funnelCounts]]: element i
    * is (userCol, t_i) — the user's earliest stage-i event time under the
    * forward-chaining rule. Useful directly for time-to-convert
    * distributions. */
  def funnelStageTimes(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, stages: Seq[String]): Seq[DataFrame] = {
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    stages.zipWithIndex.drop(1).scanLeft(first) { case (prev, (stage, _)) =>
      events.where(col(typeCol) === stage)
        .join(prev.select(col(userCol), col("t").as("__prev_t")), userCol)
        .where(col(tsCol) > col("__prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    }
  }

  /** Cohort retention: users are cohorted by the period of their FIRST
    * event (`date_trunc(period, min ts)`), and each (cohort, offset) cell
    * counts the cohort's users active in the period `offset` periods
    * later. `tsCol` must be a real timestamp column. Periods supported:
    * "week" (7-day buckets from the Monday truncation) or "day".
    *
    * Output: (cohort: date, period_offset: long, n_users: long). Offsets
    * are exact bucket differences (day diff / bucket days), cells with no
    * active users are absent (gap-fill downstream if a dense matrix is
    * needed — see [[Resample.gapFill]]). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      period: String = "week"): DataFrame = {
    val bucketDays = period match {
      case "week" => 7
      case "day"  => 1
      case other  => throw new IllegalArgumentException(
        s"period must be 'week' or 'day' (got '$other')")
    }
    def bucket(c: Column): Column = to_date(date_trunc(period, c))
    val cohorts = events.groupBy(col(userCol))
      .agg(bucket(min(col(tsCol))).as("cohort"))
    val active = events
      .select(col(userCol), bucket(col(tsCol)).as("__p"))
      .distinct()
    active.join(cohorts, userCol)
      .groupBy(col("cohort"),
        (datediff(col("__p"), col("cohort")) / bucketDays).cast("long")
          .as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Rolling distinct actors per day — trailing-window WAU/MAU: for each
    * ACTIVE day, the distinct `userCol` count over the `windowDays`-day
    * window ending that day. count(DISTINCT) is not window-mergeable, so
    * the shape is the contribution EXPLODE: each distinct (day, user)
    * activity row fans out to the `windowDays` report days it supports,
    * then one exact distinct aggregate per report day. Shuffle volume is
    * |distinct (day, user)| × windowDays — bounded by actors×days, never
    * by raw event count (the first distinct collapses event multiplicity
    * before the fan-out). Report days are restricted to days that occur
    * in the data (the day list is tiny — broadcast join).
    *
    * At 100 TB with large windows, swap the exact distinct for the
    * mergeable HLL sketch path (a20): one sketch per (day), merged over
    * the trailing window — windowDays× smaller shuffle at ~1% error.
    * Output: (day: date, uniques: long). */
  def rollingUniques(events: DataFrame, userCol: String, tsCol: String,
                     windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1 (got $windowDays)")
    val dayUser = events
      .select(to_date(col(tsCol)).as("__day"), col(userCol).as("__u"))
      .distinct()
    val activeDays = dayUser.select(col("__day").as("day")).distinct()
    dayUser
      .select(col("__u"), explode(sequence(col("__day"),
        date_add(col("__day"), windowDays - 1))).as("day"))
      .join(broadcast(activeDays), "day")
      .groupBy("day")
      .agg(countDistinct(col("__u")).as("uniques"))
  }
}
