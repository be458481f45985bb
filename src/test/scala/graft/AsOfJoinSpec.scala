package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("asOf: latest right at-or-before, inclusive ties, null when none") {
    val left = Seq(
      (1L, 100L, "p1"),   // after right@50 and right@100 → matches ts 100 (inclusive)
      (1L, 60L, "p2"),    // between 50 and 100 → matches 50
      (1L, 10L, "p3"),    // before any right row → null
      (2L, 500L, "p4")    // key with no right rows at all → null
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 50L, 5.0),
      (1L, 100L, 9.0),
      (1L, 200L, 7.0)     // later than every left row — never matched
    ).toDF("k", "ts", "v").withColumn("rts", col("ts"))
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v", "rts"))
      .select("tag", "v", "rts")
      .as[(String, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("p1") == ((Some(9.0), Some(100L))))  // inclusive at equal ts
    assert(got("p2") == ((Some(5.0), Some(50L))))
    assert(got("p3") == ((None, None)))
    assert(got("p4") == ((None, None)))
  }

  test("asOf: a matched right row with a NULL payload yields null, not an older value") {
    val left = Seq(
      (1L, 100L, "after-null"),   // latest right at-or-before is ts=90 (v=null)
      (1L, 60L, "after-value")    // latest is ts=50 (v=5.0)
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 50L, Some(5.0)),
      (1L, 90L, None: Option[Double])   // real right row, genuinely null payload
    ).toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    // DuckDB ASOF semantics: the ts=90 row IS the match; its null payload
    // must come through, not be skipped in favor of ts=50's 5.0
    assert(got("after-null").isEmpty, s"null payload was skipped: $got")
    assert(got("after-value").contains(5.0))
  }

  test("asOfForward: earliest right at-or-after, inclusive ties") {
    val left = Seq(
      (1L, 100L, "at-tie"),    // right rows at 100 and 200 → matches 100
      (1L, 120L, "between"),   // → matches 200
      (1L, 250L, "after-all"), // no right row at-or-after → null
      (2L, 10L, "no-right")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 50L, 3.0),          // before every left row — never matched
      (1L, 100L, 5.0),
      (1L, 200L, 9.0)
    ).toDF("k", "ts", "v")
    val got = graft.operators.AsOfJoin.asOfForward(
        left, right, Seq("k"), "ts", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(got("at-tie").contains(5.0))
    assert(got("between").contains(9.0))
    assert(got("after-all").isEmpty)
    assert(got("no-right").isEmpty)
  }

  test("asOf: preserves every left row exactly once with its own columns") {
    val left = (1 to 40).map(i => (i.toLong % 3, i.toLong * 10, s"row$i"))
      .toDF("k", "ts", "tag")
    val right = Seq((0L, 15L, 1.0), (1L, 5L, 2.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
    assert(out.count() == 40)
    assert(out.select("tag").distinct().count() == 40)
  }
}
