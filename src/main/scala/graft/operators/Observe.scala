package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight pipeline metrics via `Dataset.observe` — data-quality counters
  * computed DURING the main action's scan, not by a second pass. At 100 TB a
  * separate `df.where(bad).count()` audit re-reads the table; an observation
  * rides the existing job for free (an accumulator-backed aggregate over
  * exactly the rows the action processed), and works identically inside
  * foreachBatch on a stream.
  *
  * The reference logs row counts imperatively between pandas steps
  * (log_analyze.py's print-after-filter style); this is the declarative,
  * scan-free equivalent.
  */
object Observe {

  /** Attach corpus-quality counters to `df`: total rows, null/empty ids,
    * empty or whitespace-only texts, total characters. Returns the observed
    * frame (no shuffle added) and the `Observation` handle; read
    * `observation.get` AFTER an action has run the frame.
    *
    * Placement matters: the observation is a deliberate BARRIER for filters
    * written above it (pushing them below would silently shrink what the
    * metrics cover — ObserveSpec pins this), so attach it to the
    * already-filtered frame when the filter should stay pushed into the
    * scan, and below the filters when the metrics must audit raw input.
    *
    * Metric names: `rows`, `null_ids`, `empty_texts`, `total_chars`. */
  def corpusQuality(df: DataFrame, idCol: String, textCol: String,
                    name: String = "corpus_quality"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val observed = df.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(col(idCol).isNull, 1L).otherwise(0L)).as("null_ids"),
      sum(when(col(textCol).isNull ||
        trim(col(textCol)) === "", 1L).otherwise(0L)).as("empty_texts"),
      coalesce(sum(length(col(textCol))), lit(0L)).as("total_chars"))
    (observed, obs)
  }

  /** General form: attach arbitrary aggregate `metrics` under `name`. */
  def withMetrics(df: DataFrame, name: String,
                  metrics: (String, Column)*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric required")
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** A named row-level expectation: `predicate` should hold on at least
    * `minPassRate` of rows (1.0 = every row). */
  final case class Rule(name: String, predicate: Column,
                        minPassRate: Double = 1.0) {
    require(minPassRate >= 0.0 && minPassRate <= 1.0,
      s"minPassRate must be in [0, 1] (got $minPassRate)")
  }

  /** Per-rule outcome after the observed action ran. */
  final case class RuleReport(name: String, rows: Long, passed: Long,
                              passRate: Double, minPassRate: Double,
                              ok: Boolean)

  /** Handle returned by [[expect]]: run any action on `df`, then read
    * [[report]] (or [[assertPass]] to fail the job on violations). */
  final class Checked(val df: DataFrame, obs: Observation,
                      rules: Seq[Rule]) {
    /** Blocks until the observation is available (requires an action on
      * [[df]] to have run). Empty input counts as passing — there are no
      * rows to violate anything; gate emptiness with its own rule
      * upstream if zero rows is itself a defect. */
    def report(): Seq[RuleReport] = {
      val m = obs.get
      val rows = m("__rows").asInstanceOf[Long]
      rules.zipWithIndex.map { case (r, i) =>
        val passed = m(s"__pass_$i").asInstanceOf[Long]
        val rate = if (rows == 0) 1.0 else passed.toDouble / rows
        RuleReport(r.name, rows, passed, rate, r.minPassRate,
          rate >= r.minPassRate)
      }
    }

    /** Throws with every violated rule named — the fail-the-pipeline mode
      * (a quality regression should stop a 100 TB write, not annotate it). */
    def assertPass(): Unit = {
      val bad = report().filterNot(_.ok)
      if (bad.nonEmpty)
        throw new IllegalStateException(
          "expectations violated: " + bad.map(r =>
            f"${r.name} (${r.passRate}%.4f < ${r.minPassRate}%.4f, " +
              s"${r.passed}/${r.rows} rows)").mkString("; "))
    }
  }

  /** Declarative data-quality EXPECTATIONS over one observe pass — the
    * dbt-test / Deequ-check shape, scan-free: per-rule pass counts ride
    * the frame's own action as observation aggregates, so validating a
    * 100 TB write costs zero extra reads. NULL predicate results count as
    * failures (a rule that cannot evaluate did not pass).
    *
    * {{{
    * val checked = Observe.expect(docs, Seq(
    *   Observe.Rule("id_not_null", col("doc_id").isNotNull),
    *   Observe.Rule("text_nonempty", length(col("text")) > 0, 0.99)))
    * checked.df.write.parquet(out)   // the action being audited
    * checked.assertPass()
    * }}} */
  def expect(df: DataFrame, rules: Seq[Rule],
             name: String = "expectations"): Checked = {
    require(rules.nonEmpty, "at least one rule required")
    val obs = Observation(name)
    val metrics = count(lit(1)).as("__rows") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(coalesce(r.predicate, lit(false)), 1L).otherwise(0L))
          .as(s"__pass_$i")
      }
    new Checked(df.observe(obs, metrics.head, metrics.tail: _*), obs, rules)
  }
}
