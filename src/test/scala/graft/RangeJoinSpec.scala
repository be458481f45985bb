package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("pointInInterval equals the naive inequality join, no duplicate pairs") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100 - 50))
      .toDF("pid", "x")
    val intervals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 90 - 50
      (i.toLong, lo, lo + rnd.nextDouble() * 20)
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi",
        bucketWidth = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val naive = points.crossJoin(intervals)
      .where(col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive)
    assert(got.distinct == got)   // one row per matching pair, never dup'd
  }

  test("boundary inclusivity and empty/inverted intervals") {
    val points = Seq((1L, 10.0), (2L, 20.0), (3L, 15.0)).toDF("pid", "x")
    val intervals = Seq(
      (1L, 10.0, 20.0),   // both boundaries inclusive
      (2L, 30.0, 25.0))   // inverted: dropped, never matched
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", 5.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("fan-out guard raises on a degenerate interval") {
    val points = Seq((1L, 0.0)).toDF("pid", "x")
    val intervals = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi",
        bucketWidth = 1.0, maxBucketsPerInterval = 100).count()
    }
    assert(e.getMessage.contains("bucket") ||
      e.getCause != null && e.getCause.getMessage.contains("bucket"))
  }
}
