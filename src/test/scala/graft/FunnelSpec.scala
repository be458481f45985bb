package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** Funnel conversion + cohort retention on hand-traced event logs. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  // (user, type, t): u1 completes view→click→buy in order; u2 clicks
  // BEFORE viewing (the click must not count, and a later click does);
  // u3 views only; u4 never views (excluded from every stage).
  private def events = Seq(
    (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
    (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 15L),
    (3L, "view", 10L), (3L, "buy", 5L),
    (4L, "click", 10L), (4L, "buy", 20L)
  ).toDF("u", "et", "t")

  test("funnelCounts applies strict forward chaining per user") {
    val got = Funnel.funnelCounts(events, "u", "et", "t",
        Seq("view", "click", "buy"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((0L, "view", 3L), (1L, "click", 2L), (2L, "buy", 1L)))
  }

  test("funnelStageTimes picks the earliest qualifying event per stage") {
    val times = Funnel.funnelStageTimes(events, "u", "et", "t",
      Seq("view", "click"))
    val clicks = times(1).as[(Long, Long)].collect().toMap
    assert(clicks == Map(1L -> 20L, 2L -> 15L))   // u2's t=5 click skipped
  }

  test("funnel rejects duplicate stages") {
    intercept[IllegalArgumentException] {
      Funnel.funnelCounts(events, "u", "et", "t", Seq("view", "view"))
    }
  }

  test("cohortRetention buckets by first-event week and offsets in weeks") {
    def ts(day: Int): Timestamp =   // Jan 2024; the 1st is a Monday
      Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // u1 first active week of Jan 1, returns week of Jan 15 (offset 2);
    // u2 first active week of Jan 8, active twice that week (counted once)
    val ev = Seq(
      (1L, ts(2)), (1L, ts(16)),
      (2L, ts(8)), (2L, ts(9))
    ).toDF("u", "t")
    val got = Funnel.cohortRetention(ev, "u", "t", "week")
      .select(date_format(col("cohort"), "yyyy-MM-dd"), col("period_offset"),
        col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("cohortRetention rejects unsupported periods") {
    val ev = Seq((1L, Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("u", "t")
    intercept[IllegalArgumentException] {
      Funnel.cohortRetention(ev, "u", "t", "month")
    }
  }
}
