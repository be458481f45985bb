package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The operational loop for a GROWING lexical (BM25) retrieval index —
  * the third index family on the shared maintenance seam (r12 verdict:
  * [[MaintenanceCycle]] is "one seam for the third index family"; this
  * is that family), joining the IVF vector index ([[IndexIngestJob]])
  * and the dedup LSH index ([[DedupIngestJob]]). Each micro-batch of
  * (id, tokens) documents lands as one postings shard; BM25 queries
  * ([[query]]) score against everything ingested so far the moment the
  * batch's shard dirs exist. A 100 TB corpus growing daily runs exactly
  * this shape for its lexical retrieval plane: the day's documents
  * stream in, index maintenance stays O(delta) under tiered folds, and
  * the first-stage retrieval a pipeline runs before any embedding model
  * (the reference's keyword side — guessLike_u_first_select.py:50-63
  * builds tag/author term documents and :90 rebuilds an IN-MEMORY
  * gensim SparseMatrixSimilarity over them on every deploy; here the
  * postings persist and grow incrementally instead. The dense side is
  * the IVF family; `r1_rrf_fusion` / [[graft.operators.Retrieval]]
  * fuse the two) never stops or rebuilds.
  *
  * Index contents, per the generation-log protocol
  * ([[graft.io.TieredGenLog]] — `batch=N` shards, `base-<uuid>`
  * generations, the FOLDED pointer):
  *
  *   postings — (term, id, tf, dl): one row per distinct (document,
  *              term), with the document length denormalized onto it
  *              (the Lucene-norms layout — scoring needs dl for exactly
  *              the pruned posting rows, never a docs-component join)
  *   docs     — (id, dl): document token lengths (corpus bookkeeping)
  *   stats    — (n, sum_dl): ONE row per shard — the corpus-stat
  *              sidecar; N/avgdl at query time are sums over these rows
  *              (exact integral doubles ⇒ bit-identical to a full
  *              count/avg scan), so per-query cost no longer grows with
  *              the corpus (r13 verdict's last O(corpus) serving term)
  *
  * Everything BM25 needs — tf/dl from the pruned postings, df aggregated
  * in-plan, N/avgdl from the sidecar sums — stays PER-SHARD-immutable,
  * so folds are pure relayout (the stats fold-layout combines rows by
  * summing, aggregate-preserving): scores are IDENTICAL before and after
  * a fold (LexStreamSpec pins score-exactness against the batch
  * [[graft.operators.TfIdf.bm25]] at every lifecycle step). Keeping
  * df and the COMBINED N/avgdl out of the stored rows is what makes
  * shards immutable and the merge trivial: corpus-global statistics
  * would otherwise need rewriting on every append — the classic reason
  * Lucene-style engines patch segment stats at read time.
  *
  * Delivery semantics: at-least-once with result-idempotent replay — a
  * replayed batch's component frames are deterministic functions of the
  * batch rows, and [[graft.io.TieredGenLog.writeShard]] overwrites the
  * same `batch=N` dirs. (Exception: a doc REVISED between attempts is a
  * different batch payload; replay then reflects the replayed content —
  * the standard at-least-once caveat, same as the IVF family.)
  *
  * Unlike the dedup index (whose only reader is its own loop), this
  * index SERVES external queries, so a fold retains superseded
  * generations and defers their sweep one trigger interval
  * ([[MaintenanceCycle]]'s deferred-sweep contract) — queries planned
  * against the old generation list finish their scans, exactly the
  * IVF compact's reader-drain discipline. Batches append serially (one
  * foreachBatch per query), satisfying the single-writer layout. */
object LexIngestJob {

  private[graft] def genLog(dir: String): graft.io.TieredGenLog =
    new graft.io.TieredGenLog(s"$dir/index",
      Seq("postings", "docs", "stats"), "lexical index",
      // generation layout: postings range-clustered by term + sorted
      // within partitions, so [[query]]'s pushed `term IN (...)`
      // predicate skips whole files (range bounds) and row groups
      // (parquet min/max stats) — posting-list locality from plain
      // parquet, paid once per fold instead of per query. The count
      // prices the layout shuffle (one extra skinny-column scan per
      // fold — folds are rare; queries are not). The stats sidecar
      // folds to its single combined row (sums of exact integral
      // doubles — aggregate-preserving, so scores stay fold-invariant).
      foldWriteLayout = Map(
        "postings" -> (df => termLayout(df, df.count())),
        "stats" -> (df => df.coalesce(1).groupBy().agg(
          sum(col("n")).as("n"), sum(col("sum_dl")).as("sum_dl")))))

  /** The postings term layout: range-clustered by term in sized
    * partitions + sorted within them, so the pushed `term IN (...)`
    * filter skips whole files (range bounds) and row groups (parquet
    * min/max stats). ONE definition for the two writes that pay for it
    * — fold generations and the seed shard (the largest of an index's
    * life) — so a layout tuning can never leave one on a stale form. */
  private def termLayout(df: DataFrame, nRows: Long): DataFrame =
    df.repartitionByRange(
        graft.io.TieredGenLog.sizedParts(df.sparkSession, nRows, 262144L),
        col("term"))
      .sortWithinPartitions("term")

  /** Per-batch component frames: postings (term, id, tf, dl) + doc
    * lengths (id, dl). `tf`/`dl` are DoubleType — BM25's arithmetic
    * domain — so query plans never re-cast per row. Public: the batch
    * `lx1_postings_bm25` gate builds its index view through this exact
    * function, so the DuckDB oracle certifies the shard construction the
    * streaming loop writes.
    *
    * r14: postings DENORMALIZE the document length (`dl` rides every
    * posting row, attached in the same explode+aggregate — no join).
    * This is the Lucene-norms layout: at query time the score needs dl
    * for exactly the pruned posting rows, and carrying it in the
    * postings removes the per-query full scan of the docs component the
    * old `tf JOIN lens` paid — the one per-query term that grew with
    * corpus size (r13 verdict). Costs 8 bytes per posting at rest; the
    * docs component stays (corpus bookkeeping + the stats sidecar's
    * source), and folds remain pure relayout. */
  def componentsOf(docs: DataFrame, idCol: String,
                   tokensCol: String): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).as("id"), col(tokensCol).as("toks"))
    val postings = base
      .select(col("id"), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "id", "dl").agg(count(lit(1)).cast("double").as("tf"))
      .select("term", "id", "tf", "dl")
    val lens = base.select(col("id"),
      size(col("toks")).cast("double").as("dl"))
    (postings, lens)
  }

  /** The per-shard corpus-stat sidecar row: (n = doc count, sum_dl =
    * total token count), both exact integral doubles — sums of shard
    * sidecars therefore reproduce the corpus-wide `count`/`avg(dl)`
    * BIT-identically (integer-valued doubles sum exactly below 2^53),
    * which is what lets [[query]] price N/avgdl from a handful of
    * one-row files instead of scanning the docs component per query
    * (r13 verdict: the last per-query O(corpus) term). */
  def statsOf(lens: DataFrame): DataFrame =
    lens.agg(count(lit(1)).cast("double").as("n"),
      sum(col("dl")).as("sum_dl"))

  /** Index an existing corpus as the stream's starting state
    * (`batch=-1`), the [[DedupIngestJob.seed]] analogue. */
  def seed(corpus: DataFrame, idCol: String, tokensCol: String,
           dir: String): Unit = {
    val (postings, lens) = componentsOf(corpus, idCol, tokensCol)
    // the seed is the LARGEST shard of the index's life and serves
    // until the first fold — it gets the full term layout up front
    // (review finding: an unsorted seed makes the pushed term filter's
    // row-group stats useless for exactly the deployment-heavy case)
    val p = postings.persist()
    try {
      val n = p.count()
      genLog(dir).writeShard(Seq(
        termLayout(p, n),
        // lens rows = doc count <= postings rows: the bound sizes the
        // skinny component without a second count
        lens.repartition(
          graft.io.TieredGenLog.sizedParts(p.sparkSession, n, 262144L)),
        statsOf(lens)),
        -1L)
    } finally { p.unpersist(); () }
  }

  /** Start the ingest loop. `docs`: a streaming frame carrying `idCol`
    * (unique document ids — dedup upstream, e.g. behind
    * [[DedupIngestJob]] in the composed chain) and `tokensCol`
    * (array&lt;string&gt;, the engine's tokenizer output). Empty
    * micro-batches are skipped.
    *
    * `foldAfterBatches` > 0 bounds the index's READ cost exactly as the
    * sibling families do: past that many unfolded shard dirs the loop
    * folds them behind the FOLDED pointer — TIERED by `foldBaseRatio`
    * (minor fires never touch the base; see
    * [[graft.io.TieredGenLog.fold]]) — with superseded generations
    * retained until the NEXT batch's sweep so concurrent queries drain.
    * A crash between fold and sweep leaves stale generations the
    * restarted stream's sweeps collect once their drain window (aged
    * against the pointer's flip time) has passed: restarts self-heal
    * without ever under-cutting readers in other processes. */
  def start(docs: DataFrame, idCol: String, tokensCol: String, dir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            checkpointLocation: Option[String] = None,
            onBatch: (Long, Long) => Unit = (_, _) => (),
            foldAfterBatches: Int = 0,
            onFold: Long => Unit = _ => (),
            foldBaseRatio: Double = 0.3,
            maxLiveGens: Int = 8,
            sweepMinAgeMs: Long = 10000L): StreamingQuery = {
    val base = docs.writeStream.outputMode("append")
    checkpointLocation.foreach(base.option("checkpointLocation", _))
    val log = genLog(dir)
    // MaintenanceCycle provides only the fold budget here; its
    // armed-once deferred sweep is deliberately NOT used (the per-item
    // age gate below needs to retry young items every batch, which the
    // once-per-cycle arm cannot), so there is no beforeBatch call
    val cycle = new MaintenanceCycle(foldAfterBatches,
      maintain = (spark, batchId) => {
        log.fold(spark, batchId, foldBaseRatio, maxLiveGens,
          retainSuperseded = true)
        onFold(batchId)
      })
    base
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // the sweep runs EVERY batch (one listing), not once per armed
        // cycle: it is age-gated per superseded item (see
        // [[graft.io.TieredGenLog.sweep]]), so items too young at one
        // batch are collected by a later one — an armed-once sweep
        // whose age gate skipped would otherwise never retry, and
        // superseded state would accumulate for as long as the fold
        // cadence outpaces the drain window (review finding). The
        // restarted stream's first batch still self-heals: pre-crash
        // leftovers have no drain clock and sweep immediately.
        if (foldAfterBatches > 0) log.sweep(spark, sweepMinAgeMs)
        if (!batch.isEmpty) {
          val (postings, lens) = componentsOf(batch, idCol, tokensCol)
          // one materialization feeds both component writes and the
          // count (explode+agg is the batch's real work; recomputing it
          // per action would double the batch)
          val p = postings.persist()
          try {
            val nPost = p.count()
            // size the writes by row count (the DedupIngestJob
            // discipline): at the session setting every micro-batch
            // leaves one file per shuffle partition per component
            log.writeShard(Seq(
              // shards get the cheap half of the term layout (sorted
              // within sized partitions — row-group stats still skip);
              // the full range-clustering runs at fold time, where it
              // amortizes (see genLog's foldWriteLayout)
              p.repartition(graft.io.TieredGenLog.sizedParts(spark, nPost, 65536L))
                .sortWithinPartitions("term"),
              // lens rows = doc count <= postings rows: sized by the
              // same bound, never a single-task funnel for a big batch
              lens.repartition(
                graft.io.TieredGenLog.sizedParts(spark, nPost, 262144L)),
              statsOf(lens)),
              batchId)
            onBatch(batchId, nPost)
          } finally { p.unpersist(); () }
          // by-name load: the unfolded-count listing only runs when a
          // fold budget is configured
          cycle.afterBatch(spark, batchId)(log.unfoldedBatchCount(spark))
        }
        ()
      }
      .trigger(trigger)
      .start()
  }


  /** BM25 scores of every matching document for `terms` over the
    * effective index (live generations + unfolded shards): columns
    * (id, score), Robertson k1/b form — numerically identical to the
    * batch [[graft.operators.TfIdf.bm25]] over the same corpus (the
    * fold-is-pure-relayout gate). Wrap with orderBy/limit for top-k
    * retrieval; left unlimited here so callers compose (top-k, RRF
    * fusion with the dense side, score thresholds) without re-scoring.
    *
    * Scale shape (r14 — NOTHING here scans with the corpus per query):
    * postings prune to the query terms FIRST (pushed `IN` + broadcast
    * semi-join — the scan reads only `term`-matching row groups), `dl`
    * rides the pruned posting rows themselves (denormalized at shard
    * write), and N/avgdl come from the one-row-per-shard stats sidecar —
    * sums of exact integral doubles, bit-identical to the old full-scan
    * `count`/`avg` (LexStreamSpec pins serving == batch BM25). The docs
    * component is not touched at all at query time. */
  def query(spark: SparkSession, dir: String, terms: Seq[String],
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "lexical query needs at least one term")
    val view = genLog(dir).effective(spark).getOrElse(
      throw new IllegalStateException(
        s"no lexical index at $dir — nothing has been ingested"))
    val Seq(postings, _, statsRows) = view: @unchecked
    // explicit IN predicate (not just the scorer's semi-join): a join
    // never reaches the parquet scan, so without this every query reads
    // the full postings index; as a pushed filter it skips whole files
    // and row groups against the fold layout's term clustering
    scoreBm25Pruned(
      postings.where(col("term").isin(terms.distinct: _*)),
      statsRows.agg(sum(col("n")).as("n"),
        (sum(col("sum_dl")) / sum(col("n"))).as("avgdl")),
      terms, k1, b)
  }

  /** The scorer over (postings-with-dl, corpus stats), callable on any
    * such pair — the serving path above and the batch `lx1_postings_bm25`
    * gate query share this plan tail, so the DuckDB oracle certifies the
    * exact scoring code the streaming index serves. `stats` is ONE row
    * (n, avgdl) from any exactness-preserving source: the sidecar sums
    * (serving) or a direct `count`/`avg` over the doc lengths (batch). */
  def scoreBm25Pruned(postings: DataFrame, stats: DataFrame,
                      terms: Seq[String], k1: Double = 1.2,
                      b: Double = 0.75): DataFrame = {
    val spark = postings.sparkSession
    val q = broadcast(
      spark.createDataFrame(terms.distinct.map(Tuple1(_))).toDF("term"))
    val tf = postings.join(q, Seq("term"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf: Column =
      log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        idf * col("tf") * (k1 + 1.0) /
          (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("id").agg(sum(col("s")).as("score"))
  }

  /** Batch-form scorer: stats from a direct aggregate over the doc
    * lengths (the lx1 gate's shape — no index on disk, so no sidecar),
    * then the same [[scoreBm25Pruned]] tail the serving path runs. */
  def scoreBm25(postings: DataFrame, lens: DataFrame, terms: Seq[String],
                k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreBm25Pruned(postings,
      lens.agg(count(lit(1)).cast("double").as("n"),
        avg(col("dl")).as("avgdl")),
      terms, k1, b)
}
