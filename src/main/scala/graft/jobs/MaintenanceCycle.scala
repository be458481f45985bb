package graft.jobs

import org.apache.spark.sql.SparkSession

/** The maintenance scaffolding shared by the serial ingest loops — the
  * budget check, in-loop maintenance trigger, deferred sweep, and startup
  * self-heal that [[IndexIngestJob]] (IVF compact + deferred sweep) and
  * [[DedupIngestJob]] (LSH-index fold) previously hand-rolled separately
  * with subtly different idioms; a third growing-index family would have
  * copied them a third time (r11 verdict 7). One instance per streaming
  * query; every call happens on that query's serial foreachBatch thread
  * (the single-writer deployment both loops document), so the mutable
  * sweep flag needs no synchronization.
  *
  * Contract per micro-batch:
  *
  *  1. `beforeBatch(spark)` — runs the deferred `sweep` exactly once per
  *     armed cycle. Armed at construction (when a budget is configured),
  *     so a restarted stream's FIRST batch sweeps a crashed cycle's
  *     leftover superseded generation — restarts self-heal by
  *     construction, and a crash between maintain and sweep loses
  *     nothing but disk space until then.
  *  2. ...the loop appends its batch...
  *  3. `afterBatch(spark, batchId)(load)` — when a budget is configured
  *     (> 0) and `load` exceeds it, runs `maintain` and re-arms the
  *     deferred sweep. `load` is by-name: a loop whose fragmentation
  *     probe costs an extra listing only pays it when a budget is
  *     actually configured.
  *
  * The deferred sweep is the reader-drain contract: `maintain` flips the
  * live generation with the superseded one retained, external queries
  * planned against the old generation finish their scans, and one
  * trigger interval later — a bound on reader lifetime a serving loop's
  * batch boundary provides — the sweep deletes it. A maintain whose
  * cleanup is inline and needs no drain (the dedup fold, whose only
  * reader is this same thread) passes the default no-op sweep; the
  * deferral then arms nothing observable. */
final class MaintenanceCycle(budget: Int,
                             maintain: (SparkSession, Long) => Unit,
                             sweep: SparkSession => Unit = _ => ()) {
  // armed at startup so a restart sweeps a crashed cycle's leftovers
  private var pendingSweep = budget > 0

  def beforeBatch(spark: SparkSession): Unit =
    if (pendingSweep) { sweep(spark); pendingSweep = false }

  def afterBatch(spark: SparkSession, batchId: Long)(load: => Int): Unit =
    if (budget > 0 && load > budget) {
      maintain(spark, batchId)
      pendingSweep = true
    }
}
