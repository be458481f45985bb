package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** Input-stat-driven shuffle sizing — the last manual scale knob made
  * automatic (SCALING.md §50×: the composed pipeline's 25×→50× segment
  * went ≈ linear because sort spill turned on, 0 → 21.5 GB, at the FIXED
  * 32 local shuffle partitions; partitions ∝ data removes the spill term).
  *
  * The lever is `spark.sql.shuffle.partitions`: with AQE on it is the
  * INITIAL reduce-partition count that coalescing shrinks by bytes, so
  * overshooting is nearly free (AQE merges small partitions back) while
  * undershooting is what spills — per-task sort working sets grow with
  * data/partitions until they exceed task memory. The knob therefore only
  * ever RAISES the session value (floor = whatever the caller configured),
  * which also pins the correctness-gate property: at sf0.01 the estimate
  * stays under the floor and every gate query plans exactly as before.
  *
  * Two estimators, chosen by what they cost:
  *  - [[partitionsForRows]]: row count → partitions. Exact, but needs a
  *    count; callers use it where the input is a cheap scan (CorpusPrep
  *    counts its RAW parquet-backed input — a column-pruned pass — never
  *    a computed frame, which would re-execute upstream work).
  *  - [[partitionsForBytes]]: Catalyst plan statistics → partitions. Free
  *    (no action — file-scan sizeInBytes propagated through the plan),
  *    but compressed-on-disk text understates in-memory width, so it
  *    carries an expansion factor. Used by the dedup entry points whose
  *    inputs may be arbitrary computed frames.
  */
object Tuning {

  /** Hard cap: past this, task-launch overhead dominates on any realistic
    * executor count (1000 executors × 8 cores × 2 waves = 16k tasks). */
  val MaxPartitions = 16384

  /** Docs per reduce partition. Calibrated from SCALING.md §50×: 250k docs
    * over 32 partitions spilled ~0.7 GB/partition; 2048 docs/partition
    * (~123 partitions at 50×) keeps the per-task sort working set around
    * the execution-memory share of a 4 GiB-heap task slot. Overridable for
    * ops/tests via -Dgraft.tuning.rowsPerPartition. */
  def rowsPerPartition: Long =
    sys.props.get("graft.tuning.rowsPerPartition").map(_.toLong)
      .getOrElse(2048L)

  /** On-disk bytes per reduce partition for the stats estimator, after
    * the expansion factor is applied. Overridable for ops/tests via
    * -Dgraft.tuning.targetPartitionBytes (same seam as the rows/chars
    * knobs — specs force engagement at gate scale with it). */
  def TargetPartitionBytes: Long =
    sys.props.get("graft.tuning.targetPartitionBytes").map(_.toLong)
      .getOrElse(64L << 20)

  /** In-memory + intermediate expansion over on-disk parquet for shingled
    * text pipelines: ~3-4× decompression and another ~2× for the widest
    * exploded intermediate that actually hits a sort. */
  val DefaultExpansion = 8.0

  /** Last value [[withShufflePartitions]] actually applied (the floor when
    * it no-opped) — diagnostic/spec seam, not a control input. */
  @volatile private[graft] var lastChosen: Int = -1

  def partitionsForRows(rows: Long, floor: Int,
                        perPartition: Long = rowsPerPartition): Int =
    clamp(ceilDiv(rows, perPartition), floor)

  def partitionsForBytes(bytes: BigInt, floor: Int,
                         expansion: Double = DefaultExpansion): Int = {
    // plan stats use Long.MaxValue-ish sentinels for "unknown"; treat
    // anything absurd as unknown and keep the caller's setting
    if (bytes <= 0 || bytes > BigInt(1L << 50)) floor
    else clamp(ceilDiv((BigDecimal(bytes) * expansion).toLong,
      TargetPartitionBytes), floor)
  }

  /** No-action size estimate from Catalyst plan statistics. */
  def planBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Run `f` with `spark.sql.shuffle.partitions` raised to `n`, restoring
    * the caller's value after. No-ops (and never lowers) when `n` is at or
    * under the current setting. The conf is session-scoped: concurrent
    * queries on the same session during `f` plan with the raised value —
    * harmless under AQE (coalescing sizes them back down), but noted.
    *
    * Work materialized INSIDE `f` (persists, checkpoints, counts) gets the
    * raised value; a lazy frame returned OUT of `f` plans at the caller's
    * restored setting — callers executing a heavy tail later should wrap
    * their own action too. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val cur = spark.sessionState.conf.numShufflePartitions
    if (n <= cur) { lastChosen = cur; f }
    else {
      lastChosen = n
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try f
      finally spark.conf.set("spark.sql.shuffle.partitions", cur.toString)
    }
  }

  /** [[withShufflePartitions]] sized from the frame's plan statistics —
    * the free estimator, for entry points whose input may be a computed
    * frame (counting those would re-execute upstream work). */
  def withAutoShuffleBytes[T](df: DataFrame,
                              expansion: Double = DefaultExpansion)
                             (f: => T): T = {
    val spark = df.sparkSession
    val floor = spark.sessionState.conf.numShufflePartitions
    withShufflePartitions(spark,
      partitionsForBytes(planBytes(df), floor, expansion))(f)
  }

  /** Characters per reduce partition for POSITION-exploding text passes
    * (the suffix pass shuffles ~1 row ≈ 24 bytes per character every
    * round): 2.5M chars ≈ a 60 MB per-partition sort input. Overridable
    * via -Dgraft.tuning.charsPerPartition. */
  def charsPerPartition: Long =
    sys.props.get("graft.tuning.charsPerPartition").map(_.toLong)
      .getOrElse(2500000L)

  /** AQE advisory partition size used while a chars-sized scope is
    * engaged. AQE coalescing only MERGES reduce partitions (by
    * COMPRESSED map-output bytes) — it never splits past the initial
    * count — so a raised partition count can be silently merged back
    * into spilling sorts whenever per-partition compressed bytes land
    * under the 64 MB default advisory. Lowering the advisory inside the
    * engaged scope makes the raise stick. Measured honestly (SCALING.md
    * §round-10 suffix): at the 50× suffix pass the per-partition
    * compressed sizes were already above 64 MB, so this lever changed
    * nothing there (spill ~53 GB with or without it) — it guards the
    * smaller-corpus regime where coalescing WOULD undo the raise. The
    * big suffix win came from removing the sort itself (SHUFFLE_HASH
    * reencode join, SuffixDedup.scala). */
  def engagedAdvisoryBytes: Long =
    sys.props.get("graft.tuning.advisoryBytes").map(_.toLong)
      .getOrElse(16L << 20)

  /** [[withShufflePartitions]] sized from the corpus's total character
    * count — the right volume driver for passes whose shuffles carry a
    * row per text POSITION (rows and plan bytes both understate those by
    * the mean document length). Costs one single-column aggregate over
    * `docs`; callers pass raw or cheaply-computed inputs. When the knob
    * engages (above the floor) it also lowers the AQE advisory partition
    * size for the scope — see [[engagedAdvisoryBytes]] for why raising
    * partitions alone is not enough for sort-heavy position shuffles. */
  def withAutoShuffleChars[T](docs: DataFrame, textCol: String,
                              totalCharsHint: Option[Long] = None)
                             (f: => T): T = {
    val spark = docs.sparkSession
    val floor = spark.sessionState.conf.numShufflePartitions
    val totalChars = totalCharsHint.getOrElse(Option(
      docs.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col(textCol)))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L))
    val n = clamp(ceilDiv(totalChars, charsPerPartition), floor)
    if (n <= floor) withShufflePartitions(spark, n)(f)
    else {
      val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, engagedAdvisoryBytes.toString)
      try withShufflePartitions(spark, n)(f)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  private def clamp(n: Long, floor: Int): Int =
    math.min(MaxPartitions.toLong, math.max(floor.toLong, n)).toInt
}
