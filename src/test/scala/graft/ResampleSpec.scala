package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.Resample

/** Gap-fill semantics on hand-computable series: scaffold covers exactly
  * each key's own [min, max] range, gaps carry the last value forward, and
  * observed days pass through untouched. */
class ResampleSpec extends SparkSuite {
  import spark.implicits._

  test("per-key scaffold + carry-forward; ranges are per key, not global") {
    val df = Seq(
      (1L, Date.valueOf("2024-01-01"), 10L),
      (1L, Date.valueOf("2024-01-04"), 40L),
      (2L, Date.valueOf("2024-02-10"), 7L)      // different, later range
    ).toDF("k", "d", "v")
    val got = Resample.gapFillDaily(df, "k", "d", "v")
      .select(col("k"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("v_filled"), col("was_gap"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 10L, 0L),
      (1L, "2024-01-02", 10L, 1L),    // carried forward
      (1L, "2024-01-03", 10L, 1L),
      (1L, "2024-01-04", 40L, 0L),
      (2L, "2024-02-10", 7L, 0L)))    // key 2 never sees key 1's range
  }

  test("single-observation key emits exactly one non-gap row") {
    val df = Seq((9L, Date.valueOf("2024-03-03"), 5L)).toDF("k", "d", "v")
    val got = Resample.gapFillDaily(df, "k", "d", "v")
      .as[(Long, Date, Long, Long)].collect()
    assert(got.length == 1 && got.head._3 == 5L && got.head._4 == 0L)
  }

  test("generic gapFill fails fast on observations off the step grid") {
    // 00:30 against an hourly grid anchored at 00:00 would silently vanish
    // under a left join (neither emitted nor carried forward) — the full-
    // outer + marker plan must surface it as a descriptive error instead.
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 2L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 3L)
    ).toDF("k", "ts", "v")
    val err = intercept[Exception] {
      Resample.gapFill(df, "k", "ts", "v", expr("INTERVAL 1 HOUR")).collect()
    }
    assert(err.getMessage.contains("not aligned"), err.getMessage)
  }

  test("generic gapFill handles hourly timestamps") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 4L)
    ).toDF("k", "ts", "v")
    val got = Resample.gapFill(df, "k", "ts", "v", expr("INTERVAL 1 HOUR"))
      .orderBy("period")
      .select("v_filled", "was_gap").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (1L, 1L), (1L, 1L), (4L, 0L)))
  }
}
