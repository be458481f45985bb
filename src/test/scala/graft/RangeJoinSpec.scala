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

  test("intervalOverlap equals the naive overlap join, no duplicate pairs") {
    val rnd = new scala.util.Random(11)
    def mk(n: Int, idc: String) = (1 to n).map { i =>
      val lo = rnd.nextDouble() * 90 - 50
      (i.toLong, lo, lo + rnd.nextDouble() * 25)
    }.toDF(idc, s"lo_$idc", s"hi_$idc")
    val a = mk(120, "a")
    val b = mk(80, "b")
    val got = RangeJoin.intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
        bucketWidth = 10.0)
      .select("a", "b").as[(Long, Long)].collect().sorted.toSeq
    val naive = a.crossJoin(b)
      .where(col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
      .select("a", "b").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive)
    assert(got.distinct == got)
  }

  test("intervalOverlap: touching endpoints match, disjoint do not") {
    val a = Seq((1L, 0.0, 10.0)).toDF("a", "lo_a", "hi_a")
    val b = Seq((1L, 10.0, 20.0), (2L, 10.00001, 20.0)).toDF("b", "lo_b", "hi_b")
    val got = RangeJoin.intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 5.0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  test("intervalOverlap plans an equi-join on the bucket, never a nested loop") {
    val a = (1 to 50).map(i => (i.toLong, i * 1.0, i * 1.0 + 5)).toDF("a", "lo_a", "hi_a")
    val b = (1 to 50).map(i => (i.toLong, i * 1.5, i * 1.5 + 5)).toDF("b", "lo_b", "hi_b")
    val plan = RangeJoin.intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
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
