package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the corpus-versioning audit: given two snapshots of a
  * keyed table, classify every id as added / removed / changed / unchanged.
  * This is the op a training-data pipeline runs between crawl drops
  * ("what actually changed since the corpus we trained on?") and the
  * verification step after any migration or backfill.
  *
  * Plan shape: one full outer join on the id (the only shuffle, keyed and
  * AQE-skew-splittable), comparing the compare-columns directly — no
  * hashing, so a 64-bit collision can never report "unchanged" for a
  * changed row (hash the wide columns UPSTREAM into a stored fingerprint
  * if rows are too wide to carry through the join; [[graft.functions
  * .TextFunctions.fingerprint]] is the usual choice and then becomes the
  * compare column).
  */
object SnapshotDiff {

  /** Per-id diff of `oldDf` vs `newDf`: (idCol, status) with status ∈
    * {"added", "removed", "changed", "unchanged"}. `compareCols` define
    * row identity for the changed/unchanged split; null-safe equality
    * (`<=>`) so null-vs-value counts as a change and null-vs-null does
    * not. Ids must be unique per snapshot (enforce upstream — this is a
    * keyed-table contract, not a multiset diff). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select((idCol +: compareCols).map(col): _*)
      .withColumn("__old", lit(1))
      .toDF((s"__oid" +: compareCols.map("__o_" + _) :+ "__old"): _*)
    val n = newDf.select((idCol +: compareCols).map(col): _*)
      .withColumn("__new", lit(1))
      .toDF((s"__nid" +: compareCols.map("__n_" + _) :+ "__new"): _*)
    val same = compareCols
      .map(c => col("__o_" + c) <=> col("__n_" + c))
      .reduce(_ && _)
    o.join(n, col("__oid") === col("__nid"), "full_outer")
      .select(coalesce(col("__oid"), col("__nid")).as(idCol),
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed").as("status"))
  }

  /** [[diff]] rolled up to one row per status — the dashboard number. */
  def diffCounts(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, idCol, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** MERGE/upsert apply — the lakehouse write path done relationally:
    * fold a change set into a keyed snapshot in ONE full outer join.
    * A change row updates its key when it exists, inserts it when it
    * doesn't, and deletes it when `deleteCol` is true; base rows with no
    * change pass through. The inverse direction of [[diff]]: diff tells
    * you what changed between snapshots, applyChanges produces the next
    * snapshot from a change feed (CDC apply, crawl-drop fold-in,
    * correction batches).
    *
    * Columns: both frames must carry (idCol ++ valueCols); changes
    * additionally carries boolean `deleteCol`. Keys must be unique per
    * side (keyed-table contract, same as [[diff]]; dedup a raw CDC feed
    * to its latest row per key FIRST — [[graft.prep.Collections]]
    * latest-k or [[Scd]] are the usual upstreams). One shuffle total,
    * keyed and AQE-skew-splittable; never a driver row. */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
                   valueCols: Seq[String], deleteCol: String): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val b = base.select((idCol +: valueCols).map(col): _*)
      .toDF((s"__bid" +: valueCols.map("__b_" + _)): _*)
    val c = changes.select((idCol +: valueCols :+ deleteCol).map(col): _*)
      .toDF((s"__cid" +: valueCols.map("__c_" + _) :+ "__del"): _*)
    b.join(c, col("__bid") === col("__cid"), "full_outer")
      .where(!coalesce(col("__del"), lit(false)))
      .select(coalesce(col("__cid"), col("__bid")).as(idCol) +:
        valueCols.map(v =>
          when(col("__cid").isNotNull, col("__c_" + v))
            .otherwise(col("__b_" + v)).as(v)): _*)
  }
}
