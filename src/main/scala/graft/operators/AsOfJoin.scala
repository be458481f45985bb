package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the LATEST right row with the same
  * key and right.ts <= left.ts (inclusive) — the standard temporal join
  * (market data, attribution: "which view preceded this purchase").
  *
  * Spark-first plan — the union + ordered-window trick, not a range join:
  * tag both sides, union them, and take `last_value(payload, ignoreNulls)`
  * over (key ORDER BY ts, side) with right rows sorting before left rows
  * at equal timestamps. ONE shuffle on the key, no time-bucket explosion,
  * no per-row range scan — the inequality-join formulation Catalyst would
  * otherwise plan as a broadcast nested loop (quadratic per key). Scales
  * as a plain window: partition by key, bounded history per key.
  */
object AsOfJoin {

  /** left (keyCols, tsCol, ...) ⟕ right (keyCols, tsCol, payloadCols):
    * every left row, plus each `payloadCols` value from the latest
    * right row at-or-before its timestamp (null when none). Right rows
    * should be unique per (key, ts) — pre-aggregate otherwise (at equal
    * (key, ts) the window picks one arbitrarily).
    *
    * Payloads ride the window as ONE struct, not per-column `last(...,
    * ignoreNulls)`: the struct is non-null exactly when a right row
    * exists, so a matched right row whose payload VALUE is null yields
    * null (true as-of semantics) instead of falling through to an older
    * right row's value. */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String]): DataFrame =
    asOfImpl(left, right, keyCols, tsCol, payloadCols, backward = true)

  /** Forward as-of: each left row matched to the EARLIEST right row with
    * the same key and right.ts >= left.ts (inclusive) — "next event after"
    * attribution (e.g. purchase → next support contact). Same one-shuffle
    * union + ordered-window plan, with the window order reversed. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  tsCol: String, payloadCols: Seq[String]): DataFrame =
    asOfImpl(left, right, keyCols, tsCol, payloadCols, backward = false)

  private def asOfImpl(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       tsCol: String, payloadCols: Seq[String],
                       backward: Boolean): DataFrame = {
    val leftCols = left.columns
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)))
    // union schema: key + ts + side tag + left columns + payload struct
    val l = left
      .withColumn("__side", lit(1))
      .select(keyCols.map(col) ++ Seq(col(tsCol), col("__side")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => col(c)) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(keyCols.map(col) ++ Seq(col(tsCol), col("__side")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as("__p"): _*)
    // right rows (side 0) sort before left rows (side 1) at equal ts, so
    // the equal-ts match is inclusive in BOTH directions; forward = the
    // same scan over reversed time
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(if (backward) col(tsCol).asc else col(tsCol).desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val outCols =
      keyCols.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col) ++
        payloadCols.map(c => col("__p").getField(c).as(c))
    matched.where(col("__side") === 1).select(outCols: _*)
  }
}
