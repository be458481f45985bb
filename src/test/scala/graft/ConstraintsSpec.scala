package graft

import org.apache.spark.sql.functions._
import graft.operators.{Constraints, Sampling}
import graft.operators.Constraints.Check

class ConstraintsSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 20.0),
    (3L, None, 30.0),
    (4L, Some("a"), 40.0),
    (4L, Some("c"), -5.0)   // duplicate id + out-of-bound value
  ).toDF("id", "tag", "v")

  test("audit computes every metric in one pass with exact values") {
    val out = Constraints.audit(df, Seq(
      Check("completeness_tag", Constraints.completeness(col("tag")), 0.9),
      Check("uniqueness_id", Constraints.uniqueness(col("id")), 0.999),
      Check("domain_tag",
        Constraints.conformance(col("tag").isin("a", "b")), 0.7),
      Check("min_v", Constraints.minimum(col("v")), 0.0),
      Check("max_v", Constraints.maximum(col("v")), 35.0)))
      .orderBy("check_name")
      .as[(String, Double, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("completeness_tag", 0.8, 0.9, 0L),
      ("domain_tag", 0.6, 0.7, 0L),     // null tag counts against conformance
      ("max_v", 40.0, 35.0, 1L),
      ("min_v", -5.0, 0.0, 0L),
      ("uniqueness_id", 0.8, 0.999, 0L)))
  }

  test("audit is a single-job plan (one aggregate, no per-check actions)") {
    val out = Constraints.audit(df, Seq(
      Check("completeness_tag", Constraints.completeness(col("tag")), 0.9),
      Check("min_v", Constraints.minimum(col("v")), 0.0)))
    // unpivot of one agg row: the physical plan contains exactly one
    // aggregate subtree pair (partial+final), not one per check
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"))
    assert(!plan.contains("Union"))
  }

  test("audit fails closed on an empty input (null metrics -> passed = 0)") {
    val empty = df.where(lit(false))
    val out = Constraints.audit(empty, Seq(
      Check("completeness_tag", Constraints.completeness(col("tag")), 0.9),
      Check("min_v", Constraints.minimum(col("v")), 0.0)))
      .select("check_name", "passed").as[(String, Long)].collect().toSet
    assert(out == Set(("completeness_tag", 0L), ("min_v", 0L)))
  }

  test("audit rejects duplicate check names") {
    intercept[IllegalArgumentException] {
      Constraints.audit(df, Seq(
        Check("x", Constraints.minimum(col("v")), 0.0),
        Check("x", Constraints.maximum(col("v")), 0.0)))
    }
  }

  test("stratifiedFixedK: exactly min(k, |stratum|) rows, deterministic, " +
    "membership matches brute-force ranking") {
    val rows = (1 to 200).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
    val in = rows.toDF("id", "s")
    val got = Sampling.stratifiedFixedK(in, Seq("s"), "id", seed = 7L, k = 10)
      .as[(Long, String)].collect().toSet
    val again = Sampling.stratifiedFixedK(in, Seq("s"), "id", seed = 7L, k = 10)
      .as[(Long, String)].collect().toSet
    assert(got == again)
    assert(got.count(_._2 == "a") == 10 && got.count(_._2 == "b") == 10)
    // brute-force replay of the same rank key
    val withKey = in.withColumn("__k",
      pmod(xxhash64(col("id"), lit(7L)), lit(1L << 52)))
      .as[(Long, String, Long)].collect()
    val expect = withKey.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (r._3, r._1)).take(10).toSeq
    }.map(r => (r._1, r._2)).toSet
    assert(got == expect)
    // small stratum: all rows survive
    val tiny = Seq((1L, "z"), (2L, "z")).toDF("id", "s")
    assert(Sampling.stratifiedFixedK(tiny, Seq("s"), "id", 7L, 10).count() == 2)
  }

  test("stratifiedFixedK plans WindowGroupLimit (bounded per-key heap)") {
    val in = (1 to 50).map(i => (i.toLong, i % 2)).toDF("id", "s")
    val plan = Sampling.stratifiedFixedK(in, Seq("s"), "id", 1L, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }
}
