package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing, Sampling}

/** The composed training-data preparation pipeline: every stage is an
  * operator this engine already gates individually, chained the way a
  * pretraining corpus actually flows —
  *
  *   quality filter (t3) → language filter (t4) → near-dup removal (d5)
  *   → deterministic split (s11) → sequence packing (s12)
  *
  * One call, one DAG: the only actions are the ones `Dedup.dedupCorpus`'s
  * iterative cluster resolution needs; everything else stays lazy for the
  * caller to write/partition as they choose. Scale properties are the
  * stages' own (see SCALING.md) — nothing here adds a shuffle beyond
  * them.
  */
object CorpusPrep {

  /** `dedupBands`/`dedupRows` pass through to [[Dedup.dedupCorpus]]
    * (raise to 24×4 for the exact-recall regime the d5b oracle argument
    * needs). `splitBucket`/`packBucket` override the engine-hash bucket
    * derivations with caller-supplied columns — the seam that makes the
    * COMPOSED pipeline SQL-replayable (`e2e2b`: FNV buckets the oracle
    * can recompute) without forking the pipeline code; None = the
    * production xxhash64 lanes. `splitBucket` must land in [0, 10000)
    * ([[Sampling.hashSplitBy]]'s domain). */
  final case class Config(
      minQuality: Double = 0.3,
      langs: Set[String] = Set.empty,      // empty = keep every language
      shingleN: Int = 3,
      dedupBands: Int = 12,
      dedupRows: Int = 8,
      dedupMinJaccard: Double = 0.8,
      splitSeed: Long = 42L,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      packTokens: Long = 2048L,
      packBuckets: Int = 32,
      splitBucket: Option[org.apache.spark.sql.Column] = None,
      packBucket: Option[org.apache.spark.sql.Column] = None)

  /** [[prepare]]'s result plus its audit handles: read each Observation
    * AFTER an action has run the returned frame. `input` covers every raw
    * row (total, null ids, empty texts, chars); `kept` covers the rows
    * that survived quality+language filtering (what dedup then saw). */
  final case class Prepared(df: DataFrame,
                            input: org.apache.spark.sql.Observation,
                            kept: org.apache.spark.sql.Observation)

  /** docs: (idCol, textCol, ...). Returns the surviving rows with
    * `quality`, `lang` (computed if absent), `split`, `n_tokens`,
    * `bucket`, `pack_id` attached. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              cfg: Config = Config()): DataFrame =
    prepareAudited(docs, idCol, textCol, cfg).df

  /** [[prepare]] with in-flight audit counters ([[graft.operators.Observe]])
    * on the raw input and on the post-filter corpus — the "we lost N rows
    * to quality, M to language" numbers ride the pipeline's own scan
    * instead of a second pass. NOTE: dedupCorpus materializes the pair
    * stage internally, so both observations are populated by the time
    * `prepare` returns; re-running the returned frame re-observes. */
  def prepareAudited(docs: DataFrame, idCol: String, textCol: String,
                     cfg: Config = Config()): Prepared = {
    // partitions ∝ data (SCALING.md §50×: fixed 32 partitions is what
    // turned sort spill on at ≥50×). Row count over the RAW input — a
    // column-pruned scan, cheap for the parquet-backed frames this entry
    // point takes; floor = the session setting, so small-scale gate plans
    // are untouched. The raised value covers everything this call
    // materializes (dedupCorpus's pair pipeline + cluster resolution);
    // the returned lazy tail plans at the caller's restored setting.
    val spark = docs.sparkSession
    val nParts = graft.operators.Tuning.partitionsForRows(docs.count(),
      spark.sessionState.conf.numShufflePartitions)
    graft.operators.Tuning.withShufflePartitions(spark, nParts) {
      prepareAuditedBody(docs, idCol, textCol, cfg)
    }
  }

  private def prepareAuditedBody(docs: DataFrame, idCol: String,
                                 textCol: String, cfg: Config): Prepared = {
    val (observed, inputObs) =
      graft.operators.Observe.corpusQuality(docs, idCol, textCol,
        name = s"corpus_prep_input_${java.util.UUID.randomUUID}")
    val scored = observed
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .where(col("quality") >= cfg.minQuality)
    val withLang =
      if (scored.columns.contains("lang")) scored
      else scored.withColumn("lang", TextFunctions.langIdHeuristic(col(textCol)))
    val langFiltered =
      if (cfg.langs.isEmpty) withLang
      else withLang.where(col("lang").isin(cfg.langs.toSeq: _*))
    val (kept, keptObs) =
      graft.operators.Observe.corpusQuality(langFiltered, idCol, textCol,
        name = s"corpus_prep_kept_${java.util.UUID.randomUUID}")
    val deduped = Dedup.dedupCorpus(kept, idCol, textCol,
      shingleN = cfg.shingleN, bands = cfg.dedupBands, rows = cfg.dedupRows,
      minJaccard = cfg.dedupMinJaccard)
    val split = cfg.splitBucket match {
      case Some(b) => Sampling.hashSplitBy(deduped, b, cfg.fractions)
      case None => Sampling.hashSplit(deduped, idCol, cfg.splitSeed, cfg.fractions)
    }
    val counted = split
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("bucket", cfg.packBucket.getOrElse(
        pmod(xxhash64(col(idCol)), lit(cfg.packBuckets.toLong))))
    // pack within (split, bucket): packs never mix train/val/test rows,
    // and the cumsum window stays partition-parallel
    Prepared(
      Packing.contiguousPack(counted, "n_tokens", cfg.packTokens,
        bucketCol = struct(col("split"), col("bucket")), orderCol = col(idCol)),
      inputObs, keptObs)
  }

  /** The suffix-region splice stage of [[prepareFull]], fully DISTRIBUTED:
    * on a 100 TB corpus with a few percent duplicated text the region
    * list is billions of rows and a driver materialization dies —
    * `removeRegions` is a plain join and never needs it local (the staged
    * detection frame reads the doubling loop's final checkpoint; call the
    * returned release hook once the splice has materialized, its only
    * consumer). Package-visible so CorpusPrepSpec can pin the plan shape
    * (no LocalRelation of regions anywhere in the splice). */
  private[graft] def splicedCorpus(docs: DataFrame, idCol: String,
                                   textCol: String, regionMinLength: Int,
                                   totalCharsHint: Option[Long] = None)
      : (DataFrame, () => Unit) = {
    val regions = graft.operators.SuffixDedup.duplicatedRegionsStaged(
      docs, idCol, textCol, regionMinLength, totalCharsHint)
    (graft.operators.SuffixDedup.removeRegions(
      docs, regions.df, idCol, textCol), regions.release)
  }

  /** The FULL modern pipeline — [[prepare]]'s stages plus the three
    * passes a frontier pretraining corpus adds, in flow order:
    *
    *   suffix-region removal (d14/d14b: cut repeated boilerplate spans
    *   BEFORE scoring, so quality sees the cleaned text) → quality →
    *   language → near-dup corpus dedup (d5) → benchmark decontamination
    *   (dc1: drop docs overlapping eval sets) → DSIR importance selection
    *   (s19: keep the `dsirKeep` most-target-like docs) → split → pack.
    *
    * Each stage is individually oracle- or spec-gated; this call only
    * chains them (no new shuffles beyond the stages' own). `benchmark` is
    * the eval corpus to decontaminate against (None = skip);
    * `dsirTarget`/`dsirKeep` configure selection (dsirKeep <= 0 = skip).
    *
    * `stageTimer(name, seconds)` fires once per EAGER stage, named by what
    * that stage's actions actually execute (lazy stages fuse into the
    * next barrier — quality+lang run inside `filter_dedup`, split+pack
    * inside `decontam_checkpoint`): `detect_regions` (the doubling loop),
    * `splice_checkpoint`, `filter_dedup` (dedupCorpus's internal
    * materializations pull the quality/language filters),
    * `decontam_checkpoint` (decontam scan + the split/pack column tails).
    * The DSIR weight model + final semi-join stay lazy by design and are
    * counted by the CALLER's first action on the returned frame. */
  def prepareFull(docs: DataFrame, idCol: String, textCol: String,
                  cfg: Config = Config(),
                  regionMinLength: Int = 64,
                  benchmark: Option[DataFrame] = None,
                  decontamN: Int = 20,   // char n-grams; 8 would hit on
                                         // ubiquitous 8-char sequences
                  dsirTarget: Option[org.apache.spark.sql.Column] = None,
                  dsirBuckets: Int = 1 << 16,
                  dsirKeep: Int = -1,
                  stageTimer: (String, Double) => Unit = (_, _) => ())
      : DataFrame = {
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      stageTimer(name, (System.nanoTime() - t0) / 1e9); r
    }
    // partitions ∝ data for the WHOLE composed pipeline — the suffix
    // doubling loop and the splice checkpoint are the most spill-prone
    // prefix, so the raise must precede detect_regions, not just the
    // inner prepare() call (which re-derives the same floor-clamped value
    // from its own count and no-ops inside this scope). ONE startup agg
    // derives both estimators — rows for this scope, total characters for
    // the suffix stage's own (higher) chars-based raise — instead of two
    // separate passes over the raw corpus.
    val spark0 = docs.sparkSession
    val statsRow = docs.agg(
      count(lit(1)), sum(length(col(textCol)))).head()
    val (nRows, totalChars) =
      (statsRow.getLong(0), if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1))
    val nParts = graft.operators.Tuning.partitionsForRows(nRows,
      spark0.sessionState.conf.numShufflePartitions)
    graft.operators.Tuning.withShufflePartitions(spark0, nParts) {
    val (splicedLazy, regionsRelease) = timed("detect_regions")(
      splicedCorpus(docs, idCol, textCol, regionMinLength,
        totalCharsHint = Some(totalChars)))
    // MATERIALIZATION BARRIER: the spliced corpus is re-read by every
    // internal action downstream (dedupCorpus's pair pipeline + cluster
    // resolution, the decontamination scan, both DSIR consumers) — without
    // lineage truncation each of those re-executes the suffix-region
    // detect+splice, which is the most expensive prefix of the whole DAG
    // (e2e2 ran 3.5x the sum of its stages). On a cluster this barrier is
    // where you'd write the intermediate table; localCheckpoint is the
    // single-app form (executor-local blocks, no driver round-trip).
    val spliced = timed("splice_checkpoint")(splicedLazy.localCheckpoint(true))
    regionsRelease()
    val base = timed("filter_dedup")(prepare(spliced, idCol, textCol, cfg))
    val decontaminated = timed("decontam_checkpoint")((benchmark match {
      case Some(b) =>
        graft.operators.Decontaminate.decontaminate(base, b, textCol,
          n = decontamN)
      case None => base
    // Same reason: the DSIR branch consumes `decontaminated` twice (gram
    // model + final semi-join) in one action — no ReusedExchange applies
    // because the two subtrees diverge right at the scan.
    }).localCheckpoint(true))
    // `spliced`'s blocks are dead once `decontaminated` is materialized
    // (every later consumer reads the second checkpoint) — release them
    // now instead of holding two corpus copies until GC notices; repeated
    // invocations in one session otherwise stack generations of dead
    // blocks against the block manager.
    spliced.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
    (dsirTarget, dsirKeep) match {
      case (Some(target), keep) if keep > 0 =>
        val weights = graft.operators.Dsir.importanceWeightsTokens(
          decontaminated.withColumn("__toks",
            TextFunctions.tokenize(lower(col(textCol)))),
          idCol, col("__toks"), target, dsirBuckets)
        val u = (pmod(xxhash64(col(idCol), lit(cfg.splitSeed)),
          lit(1L << 52)) + 0.5) / lit((1L << 52).toDouble)
        val selected = graft.operators.Dsir.resampleTopK(
          weights, idCol, "logw", u, keep)
        decontaminated.join(selected.select(col(idCol)), Seq(idCol))
      case _ => decontaminated
    }
    } // withShufflePartitions
  }
}
