package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit (the Deequ-style validation
  * pass a production table lands behind): completeness, key uniqueness,
  * domain membership, pattern conformance, and bound checks, all computed
  * in ONE pass over the table.
  *
  * Scale shape: every check compiles to an aggregate expression inside a
  * single `agg` — one scan, partial+final aggregation, and a constant-size
  * result row that unpivots to one row per check. No per-check pass, no
  * driver-side loop; `uniqueness` contributes the only keyed shuffle
  * (count-distinct expand, |distinct values| intermediate rows). At
  * 100 TB swap [[uniqueness]] for [[uniquenessApprox]] and the audit's
  * shuffle is one sketch per partition.
  *
  * Reference analogue: the ad-hoc `dropna`/`astype`-and-drop guards
  * scattered through the reference's loaders (log_analyze.py:21-37,
  * simility_books.py:47,52) — here a first-class, composable audit. */
object Constraints {

  /** One named check: `metric` must be an AGGREGATE column; the check
    * passes when the (rounded) metric is >= `threshold`. */
  final case class Check(name: String, metric: Column, threshold: Double)

  /** Fraction of rows with a non-null value. */
  def completeness(c: Column): Column = avg(c.isNotNull.cast("double"))

  /** Distinct values over non-null count — 1.0 iff the column is a key. */
  def uniqueness(c: Column): Column =
    countDistinct(c).cast("double") / count(c).cast("double")

  /** [[uniqueness]] with HLL distinct counting — the 100 TB form (2%
    * default error; thresholds for key checks should then be ~0.97, not
    * 0.999...). */
  def uniquenessApprox(c: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(c, rsd).cast("double") / count(c).cast("double")

  /** Fraction of rows satisfying an arbitrary row predicate (domain
    * membership `c.isin(...)`, pattern `c.rlike(...)`, range...). A NULL
    * predicate (e.g. a null column under `isin`) counts as NON-conforming
    * — `avg` would silently skip those rows and overstate conformance. */
  def conformance(pred: Column): Column =
    avg(coalesce(pred, lit(false)).cast("double"))

  def minimum(c: Column): Column = min(c).cast("double")
  def maximum(c: Column): Column = max(c).cast("double")

  /** Run every check in one aggregation pass. Output: one row per check —
    * (check_name, metric, threshold, passed 0/1), `metric` rounded to
    * `scale` BEFORE the threshold compare so pass/fail is stable across
    * engines and float noise. */
  def audit(df: DataFrame, checks: Seq[Check], scale: Int = 6): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names")
    val agged = df.agg(
      round(checks.head.metric.cast("double"), scale).as("__m0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        round(c.metric.cast("double"), scale).as(s"__m${i + 1}") }: _*)
    val names = array(checks.map(c => lit(c.name)): _*)
    val thresholds = array(checks.map(c => lit(c.threshold)): _*)
    val metrics = array(checks.indices.map(i => col(s"__m$i")): _*)
    agged
      .select(posexplode(metrics).as(Seq("__i", "metric")),
        names.as("__names"), thresholds.as("__ths"))
      .select(
        element_at(col("__names"), col("__i") + 1).as("check_name"),
        col("metric"),
        element_at(col("__ths"), col("__i") + 1).as("threshold"))
      // fail closed: an empty input (or a metric over all-null values)
      // yields NULL metrics — a quality gate must report those as FAILED,
      // not vanish them into three-valued logic
      .withColumn("passed",
        coalesce(col("metric") >= col("threshold"), lit(false)).cast("long"))
  }
}
