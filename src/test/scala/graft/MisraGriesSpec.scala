package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import graft.expressions.MisraGriesTopK

/** Misra-Gries aggregate semantics: exact when k exceeds the distinct
  * count, classic decrement-eviction on a deterministic single-partition
  * stream, and the deterministic [f - n/(k+1), f] guarantee under
  * partial-aggregate merges (which holds for ANY merge order — the only
  * thing the spec may assert across partitions). */
class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  private def mg(c: org.apache.spark.sql.Column, k: Int) =
    column(MisraGriesTopK(expression(c), k).toAggregateExpression())

  test("k > distinct items: sketch equals exact groupBy counts") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("t")
    val got = df.agg(mg(col("t"), 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.est").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("eviction trace on a single partition matches the hand-run algorithm") {
    // k=2, stream a,a,a,b,c: a→1,2,3; b enters (size<2) →1; c arrives with
    // buffer full → decrement all: a=2, b=0 (dropped), c NOT inserted
    val df = Seq("a", "a", "a", "b", "c").toDF("t").coalesce(1)
    val got = df.agg(mg(col("t"), 2).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.est").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L))
  }

  test("guarantee under merges: est in [f - n/(k+1), f], heavy item present") {
    // 400 x "hot" + 200 singletons over 4 partitions, k = 16:
    // n = 600, slack = n/(k+1) = 35 → est(hot) ∈ [365, 400]
    val rows = (1 to 400).map(_ => "hot") ++ (1 to 200).map(i => s"u$i")
    val df = rows.toDF("t").repartition(4)
    val got = df.agg(mg(col("t"), 16).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.est").as[(String, Long)].collect().toMap
    assert(got.contains("hot"), s"guaranteed heavy item missing: $got")
    assert(got("hot") <= 400L && got("hot") >= 400L - 600L / 17,
      s"estimate out of bounds: ${got("hot")}")
    assert(got.size <= 16, s"sketch exceeded k counters: ${got.size}")
    // every estimate is an undercount (never invents mass)
    assert(got.forall { case (i, est) =>
      est <= (if (i == "hot") 400L else 1L)
    }, got.toString)
  }

  test("grouped aggregation keeps sketches per group; SQL form reachable") {
    GraftExtensions.register(spark)
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "t")
    df.createOrReplaceTempView("mg_t")
    val got = spark.sql(
      "SELECT g, mg_topk(t, 8) AS hh FROM mg_t GROUP BY g ORDER BY g")
      .select(col("g"), col("hh").getItem(0).getField("item").as("top"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("g1", "x"), ("g2", "z")))
    val err = intercept[Exception] {
      spark.sql("SELECT mg_topk(t, CAST(g AS INT)) FROM mg_t").collect()
    }
    assert(err.getMessage.contains("LITERAL"), err.getMessage)
  }
}
