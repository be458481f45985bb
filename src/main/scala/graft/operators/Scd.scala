package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history compression: collapse a per-key
  * event/snapshot stream into SCD Type-2 validity intervals of a tracked
  * attribute. The canonical warehouse shape for "what was this entity's
  * state at time t" — and, in a training-data pipeline, the compact form
  * of per-document metadata that changes across crawl snapshots (license,
  * language tag, quality band) so point-in-time joins stay cheap.
  *
  * Spark-first: two windows over the SAME (key, order) partitioning —
  * Catalyst plans them as ONE shuffle + one sort, the change filter
  * between them is a pure projection. No self-joins, no driver state;
  * scales as a single pass per 100 TB snapshot log.
  */
object Scd {

  /** Compress `df` to rows where any of `attrCols` differs from its
    * predecessor in (`orderCols`) order within `keyCol` (null-safe
    * comparison; the first row per key always opens an interval). Output:
    * key, the tracked attrs, `valid_from` = the opening row's `versionCol`
    * value, `valid_to` = the NEXT interval's valid_from (null = interval
    * still current).
    *
    * `orderCols` must be a TOTAL order within each key (add a unique
    * tie-break column — row identity — as the last element); otherwise
    * ties make lag/lead nondeterministic. */
  def scd2(df: DataFrame, keyCol: String, orderCols: Seq[Column],
           versionCol: String, attrCols: Seq[String],
           carryCols: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "at least one tracked attribute required")
    require(orderCols.nonEmpty, "at least one ordering column required")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val outCols = Seq(col(keyCol)) ++ attrCols.map(col) ++
      carryCols.map(col) ++
      Seq(col(versionCol).as("valid_from")) ++
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    val opens = df
      .withColumn("__chg", changed)
      .where(col("__chg"))
      .select(outCols: _*)
    // valid_to: the next opening row's valid_from, in the SAME (key,
    // order) window — ordering by the carried __o* columns keeps the
    // original total order even though the filter dropped rows between
    // openings.
    val w2 = Window.partitionBy(keyCol)
      .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)
    opens
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .drop(orderCols.indices.map(i => s"__o$i"): _*)
  }
}
