package graft

import org.apache.spark.sql.functions._
import graft.operators.Observe

/** `observe()` metrics must count exactly the rows the action processed —
  * no second scan, no plan change — and compose with downstream filters
  * (the observation sees pre-filter rows when attached pre-filter). */
class ObserveSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (Some(1L), "hello world"),
    (Some(2L), ""),
    (Some(3L), "   "),
    (None, "orphan text"),
    (Some(5L), null.asInstanceOf[String])
  ).toDF("id", "text")

  test("corpusQuality counts rows, null ids, empty texts, total chars") {
    val (observed, obs) = Observe.corpusQuality(docs, "id", "text")
    assert(observed.count() == 5)
    val m = obs.get
    assert(m("rows") == 5L)
    assert(m("null_ids") == 1L)
    assert(m("empty_texts") == 3L)   // "", whitespace-only, and NULL text
    assert(m("total_chars") == ("hello world".length + 3 + "orphan text".length).toLong)
  }

  test("observation rides the main action — attached pre-filter, it sees pre-filter rows") {
    val (observed, obs) = Observe.corpusQuality(docs, "id", "text", name = "pre")
    val kept = observed.where(col("id").isNotNull && trim(col("text")) =!= "")
    assert(kept.count() == 1)        // only (1, "hello world") survives
    assert(obs.get("rows") == 5L,
      "metrics must cover every scanned row, not just survivors")
  }

  test("withMetrics attaches arbitrary aggregates") {
    val df = Seq((1L, 10.0), (2L, -3.0), (3L, 7.0)).toDF("k", "v")
    val (observed, obs) = Observe.withMetrics(df, "m",
      "negatives" -> sum(when(col("v") < 0, 1L).otherwise(0L)),
      "max_v" -> max(col("v")))
    assert(observed.count() == 3)
    assert(obs.get("negatives") == 1L)
    assert(obs.get("max_v") == 10.0)
  }

  test("observe is a deliberate filter barrier; attach it ABOVE filters to keep pushdown") {
    val base = Tables.part(spark, "/root/testdata/sf0.001")
    // a filter ABOVE the observation must NOT push below it — the metrics
    // would silently stop covering the filtered-out rows
    val (obsBelow, _) = Observe.withMetrics(base, "pb", "n" -> count(lit(1)))
    val barrier = obsBelow.where(col("p_size") > 25)
      .queryExecution.executedPlan.toString
    assert(!barrier.contains("PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,25)"),
      s"filter must not cross the observation boundary:\n$barrier")
    // the right composition — observe the already-filtered frame — keeps
    // scan pushdown fully intact
    val (obsAbove, _) = Observe.withMetrics(
      base.where(col("p_size") > 25), "pa", "n" -> count(lit(1)))
    val pushed = obsAbove.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,25)"),
      s"filter no longer pushed when observing above it:\n$pushed")
  }
}
