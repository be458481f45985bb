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

/** Declarative expectations over one observe pass: pass-rate math, null
  * predicates counted as failures, assertPass raising with rule names,
  * and the no-extra-scan property (metrics ride the audited action). */
class ExpectationsSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.Observe

  test("pass rates per rule; violations named in assertPass") {
    val df = Seq((1L, "ok"), (2L, "ok"), (3L, ""), (4L, null))
      .toDF("id", "text")
    val checked = Observe.expect(df, Seq(
      Observe.Rule("id_positive", col("id") > 0),
      Observe.Rule("text_nonempty", length(col("text")) > 0, 0.9),
      Observe.Rule("text_mostly_present", col("text").isNotNull, 0.5)))
    checked.df.count()   // the audited action
    val rep = checked.report().map(r => r.name -> r).toMap
    assert(rep("id_positive").ok && rep("id_positive").passed == 4)
    // "" fails length>0; null predicate result ALSO counts as failed
    assert(rep("text_nonempty").passed == 2 &&
      rep("text_nonempty").passRate == 0.5 && !rep("text_nonempty").ok)
    assert(rep("text_mostly_present").ok)
    val err = intercept[IllegalStateException](checked.assertPass())
    assert(err.getMessage.contains("text_nonempty") &&
      !err.getMessage.contains("id_positive"), err.getMessage)
  }

  test("empty input passes every rule; zero-rows gating is the caller's rule") {
    val df = Seq.empty[(Long, String)].toDF("id", "text")
    val checked = Observe.expect(df,
      Seq(Observe.Rule("id_not_null", col("id").isNotNull)))
    checked.df.count()
    assert(checked.report().forall(_.ok))
  }

  test("metrics ride the audited action: no extra job is triggered") {
    val df = (1L to 1000L).toDF("id")
    val checked = Observe.expect(df,
      Seq(Observe.Rule("positive", col("id") > 0)))
    checked.df.count()     // the audited action (job count is its own business)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    checked.assertPass()   // reads the observation — must not launch a job
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"reading the report launched ${after - before} extra job(s)")
  }
}
