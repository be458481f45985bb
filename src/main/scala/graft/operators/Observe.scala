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
}
