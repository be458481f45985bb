package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** The operational loop for a GROWING deduplicated corpus — the dedup
  * counterpart of [[IndexIngestJob]] (r11): each micro-batch of new
  * documents is near-dup-deduplicated against everything accepted so
  * far, survivors land in `dir/survivors/batch=N`, and the survivors'
  * LSH bands + shingle sets are appended to `dir/index/` so the NEXT
  * batch dedups against them too. A 100 TB ingest pipeline runs exactly
  * this shape: the index grows O(survivors), each batch pays
  * O(batch × colliding buckets) — never O(corpus²) and never a corpus
  * rescan (the d7 operator, closed under a stream).
  *
  * Layout (all appends are per-batch `batch=N` subdirs written with
  * overwrite — the idempotence anchor, see below):
  *
  *   dir/index/banded/batch=N    — (id, band, bucket) of batch N's survivors
  *   dir/index/shingled/batch=N  — (id, sh) shingle sets of the same rows
  *   dir/survivors/batch=N       — the accepted documents themselves
  *
  * Delivery semantics: with a `checkpointLocation` over a replayable
  * source this is at-least-once, and the replay is RESULT-idempotent:
  *  - every write is keyed by the deterministic micro-batch id and mode
  *    "overwrite", so a replayed batch rewrites the same three dirs with
  *    the same rows rather than appending duplicates;
  *  - a replayed batch re-dedups against an index that may already hold
  *    ITS OWN first-attempt rows — identical-id self-matches are
  *    excluded by id (`a =!= b`), and with `dedupWithinBatch = true`
  *    (default) any two same-batch survivors have Jaccard below the
  *    threshold by construction, so none of them can knock another out
  *    on replay. With `dedupWithinBatch = false` a replayed batch could
  *    drop a first-attempt survivor that near-duplicates a same-batch
  *    row — run within-batch dedup (or dedup upstream) when replay
  *    matters.
  * Batches run serially per query, satisfying the single-writer layout.
  *
  * Bootstrap: [[seed]] indexes an existing corpus as `batch=-1` so the
  * stream dedups against history from its first trigger. */
object DedupIngestJob {

  /** Index an existing corpus (already deduplicated) as the stream's
    * starting state. Seed documents are NOT rewritten to survivors/ —
    * they already live wherever the corpus lives. */
  def seed(corpus: DataFrame, idCol: String, textCol: String, dir: String,
           shingleN: Int = 3, bands: Int = 12, rows: Int = 8): Unit =
    writeIndexShard(corpus, idCol, textCol, dir, -1L, shingleN, bands, rows)

  /** `foldAfterBatches` > 0 bounds the index's READ cost: when more than
    * that many unfolded `batch=N` shard dirs exist after a batch, the
    * loop folds them (plus any prior base) into ONE `base-<uuid>`
    * generation and commits by flipping the `FOLDED` pointer
    * ([[graft.io.AtomicPointer]]) — the dedup-index analogue of
    * [[graft.operators.Ann.compactIvfIndex]]. Without it, a year of
    * micro-batches leaves ~2×365×partitions index files whose
    * per-trigger listing/open cost grows with APPEND HISTORY rather than
    * data. The fold is replay-safe: the pointer records the highest
    * folded batch id, [[loadIndex]] reads base + STRICTLY NEWER batch
    * dirs only, so a replayed batch ≤ the fold boundary re-creates dirs
    * the effective view ignores (they are swept by the next fold) —
    * without this filter the replayed rows would double-count bucket
    * sizes and silently mask true duplicates behind the `maxBucket`
    * skew guard. Fold runs inside the serial foreachBatch, so it never
    * races an append (single-writer by construction). */
  def start(docs: DataFrame, idCol: String, textCol: String, dir: String,
            shingleN: Int = 3, bands: Int = 12, rows: Int = 8,
            minJaccard: Double = 0.8, maxBucket: Long = 200L,
            dedupWithinBatch: Boolean = true,
            trigger: Trigger = Trigger.AvailableNow(),
            checkpointLocation: Option[String] = None,
            onBatch: (Long, Long) => Unit = (_, _) => (),
            foldAfterBatches: Int = 0,
            onFold: Long => Unit = _ => (),
            foldBaseRatio: Double = 0.3,
            maxLiveGens: Int = 8): StreamingQuery = {
    val base = docs.writeStream.outputMode("append")
    checkpointLocation.foreach(base.option("checkpointLocation", _))
    // the shared serial-loop maintenance scaffolding ([[MaintenanceCycle]]):
    // fold-on-budget; the fold's cleanup is inline (this thread is the
    // index's only reader — no drain to wait for), so the sweep is a no-op
    val cycle = new MaintenanceCycle(foldAfterBatches,
      maintain = (spark, batchId) => {
        foldIndex(spark, dir, batchId, foldBaseRatio, maxLiveGens)
        onFold(batchId)
      })
    base
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cycle.beforeBatch(batch.sparkSession)
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val withinDeduped =
            if (dedupWithinBatch)
              Dedup.dedupCorpus(batch, idCol, textCol, shingleN, bands,
                rows, minJaccard, maxBucket)
            else batch
          val survivors = loadIndex(spark, dir) match {
            case None => withinDeduped
            case Some(idx) =>
              val dupIds = Dedup.lshPairsAgainstIndex(withinDeduped, idx,
                  idCol, textCol, shingleN, bands, rows, minJaccard,
                  maxBucket)
                // a replayed batch meets its own first-attempt rows in
                // the index: identical ids are the replay artifact, not
                // a duplicate — see the idempotence contract above
                .where(col("a") =!= col("b"))
                .select(col("a").as(idCol)).distinct()
              withinDeduped.join(dupIds, Seq(idCol), "left_anti")
          }
          // one materialization feeds three writes (the dedup chain is
          // nontrivial; recomputing it per action would triple the batch)
          val s = survivors.persist()
          try {
            val n = s.count()
            // size the batch's writes by its ROW count: at the session
            // setting every micro-batch leaves one file per shuffle
            // partition per component — a year of daily batches is tens
            // of thousands of near-empty files before the fold ever runs.
            // repartition (not coalesce) so the minhash compute upstream
            // keeps its parallelism; the shuffled frames are tiny.
            s.repartition(sizedParts(spark, n, 8192L))
              .write.mode("overwrite")
              .parquet(s"$dir/survivors/batch=$batchId")
            writeIndexShard(s, idCol, textCol, dir, batchId,
              shingleN, bands, rows, nDocs = Some(n))
            onBatch(batchId, n)
          } finally { s.unpersist(); () }
          // by-name load: the unfolded-count listing only runs when a
          // fold budget is configured
          cycle.afterBatch(spark, batchId)(unfoldedBatchCount(spark, dir))
        }
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Accepted documents across all batches (plus nothing else — seeds
    * stay wherever the seed corpus lives). */
  def survivors(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/survivors").drop("batch")

  /** Partition count for a write of `rows` rows at ~`rowsPerFile` each,
    * floored at 1 and capped at the session setting (never raises). */
  private def sizedParts(spark: SparkSession, rows: Long,
                         rowsPerFile: Long): Int =
    math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      (rows + rowsPerFile - 1) / rowsPerFile)).toInt

  private def writeIndexShard(docs: DataFrame, idCol: String,
                              textCol: String, dir: String, batchId: Long,
                              shingleN: Int, bands: Int, rows: Int,
                              nDocs: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    val idx = Dedup.lshIndex(docs, idCol, textCol, shingleN, bands, rows)
    // banded rows = nDocs × bands exactly; shingled = nDocs (set-valued,
    // wider rows). The one-time seed path passes no count and writes at
    // the session setting — only the ACCUMULATING per-batch shards need
    // the file-count bound.
    val banded = nDocs.map(n => idx.banded.repartition(
      sizedParts(spark, n * bands, 65536L))).getOrElse(idx.banded)
    val shingled = nDocs.map(n => idx.shingles.repartition(
      sizedParts(spark, n, 16384L))).getOrElse(idx.shingles)
    banded.write.mode("overwrite")
      .parquet(s"$dir/index/banded/batch=$batchId")
    shingled.write.mode("overwrite")
      .parquet(s"$dir/index/shingled/batch=$batchId")
  }

  /** The FOLDED pointer's parsed content: the highest batch id folded
    * into the live generation LIST under `dir/index/` — ordered oldest
    * (the big base, L2) to newest (minor-fold L1s). One generation is
    * the classic fully-folded state; multiple generations are the tiered
    * state minor folds produce (r12 verdict 1): batches fold into
    * SIBLING generations without rewriting the base, and the base is
    * rewritten only when the accumulated minor generations reach a fixed
    * fraction of it — amortizing lifetime maintenance writes from
    * quadratic-in-corpus to linear. */
  private final case class FoldState(maxBatch: Long, gens: Seq[String])

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def validGenName(n: String): Boolean =
    n.startsWith("base-") && !n.contains("/") && !n.contains("..")

  private def readFold(spark: SparkSession, dir: String): Option[FoldState] =
    graft.io.AtomicPointer.read(fs(spark, dir), s"$dir/index", "FOLDED")
      .map { c =>
        val parts = c.split("\\s+")
        // the numeric field parses via Try so a digit string beyond Long
        // range still dies with the descriptive message, not a bare
        // NumberFormatException
        val maxB = if (parts.length == 2)
          scala.util.Try(parts(0).toLong).toOption else None
        // pre-tiering pointers hold one name; tiered pointers a
        // comma-separated ordered list — both parse here
        val gens = if (parts.length == 2)
          parts(1).split(",").toSeq.filter(_.nonEmpty) else Seq.empty
        require(maxB.isDefined && gens.nonEmpty && gens.forall(validGenName),
          s"corrupt FOLDED pointer at $dir/index: '$c'")
        FoldState(maxB.get, gens)
      }

  /** Anchored `batch=N` dir-name parse: stray near-protocol names (an
    * editor backup `batch=3.bak`, a mis-copied dir) are NOT protocol
    * state and must be ignored, not crash the stream inside foreachBatch
    * with a bare NumberFormatException — the same tolerance the IVF
    * marker listing applies to non-matching names (r11 advice). */
  private val BatchDirName = "^batch=(-?\\d+)$".r
  private def parseBatchDir(name: String): Option[Long] =
    BatchDirName.findFirstMatchIn(name)
      .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)

  /** Unfolded `batch=N` shard ids under one index component (banded and
    * shingled move in lockstep; banded is listed). Ids at or below the
    * fold boundary are replay leftovers the effective view ignores. */
  private def unfoldedBatches(spark: SparkSession, dir: String,
                              fold: Option[FoldState]): Seq[Long] = {
    val floor = fold.map(_.maxBatch).getOrElse(Long.MinValue)
    (try Option(fs(spark, dir).listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/index/banded")))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus]).toSeq
    // an un-seeded stream's first batch has no index dir yet
    catch { case _: java.io.FileNotFoundException =>
      Seq.empty[org.apache.hadoop.fs.FileStatus] })
      .filter(_.isDirectory).map(_.getPath.getName)
      .flatMap(parseBatchDir)
      .filter(_ > floor)
  }

  private def unfoldedBatchCount(spark: SparkSession, dir: String): Int =
    unfoldedBatches(spark, dir, readFold(spark, dir)).size

  /** Recursive byte size of one path (0 when absent) — the tier
    * decision's input. One getContentSummary RPC per live dir; the live
    * set is bounded by `maxLiveGens` + the unfolded budget. */
  private def pathBytes(hfs: org.apache.hadoop.fs.FileSystem,
                        p: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(p)
    try { if (hfs.exists(hp)) hfs.getContentSummary(hp).getLength else 0L }
    catch { case _: java.io.FileNotFoundException => 0L }
  }

  /** Fold unfolded batch shards into a fresh `base-<uuid>` generation and
    * flip the FOLDED pointer. TIERED (r12 verdict 1): a MINOR fold reads
    * only the batch shards and APPENDS the new generation to the live
    * list — the base is never touched, so per-fire cost is O(batch
    * window); a MAJOR fold reads every live generation plus the batches
    * and collapses to ONE generation — O(corpus), but fired only when
    * the accumulated minor generations + batches reach `baseRatio` of
    * the base (or the list hits `maxGens`), so base rewrites are
    * geometric and lifetime maintenance writes are linear in corpus
    * (amortized ~1/baseRatio extra writes per ingested byte) instead of
    * quadratic. `baseRatio <= 0` forces every fold major (the
    * pre-tiering behavior). The new generation is fully materialized
    * before the flip; superseded dirs (consumed generations, orphan
    * bases from crashed folds, batch dirs ≤ the new boundary — including
    * replay leftovers) are deleted AFTER it, off the commit path. No
    * retain cycle is needed: the index's only reader is this same serial
    * foreachBatch thread. */
  private def foldIndex(spark: SparkSession, dir: String,
                        upToBatch: Long, baseRatio: Double = 0.3,
                        maxGens: Int = 8): Unit = {
    val idxDir = s"$dir/index"
    val hfs = fs(spark, dir)
    val fold = readFold(spark, dir)
    // the batch-dir ids this fold consumes — recorded inside the base so
    // a pointerless restart can discriminate crashed from lost (below)
    val srcIds = unfoldedBatches(spark, dir, fold)
    val gens = fold.map(_.gens).getOrElse(Seq.empty)
    // tier decision, by BYTES (corpus mass, not dir counts): minor while
    // everything-but-the-base is still small relative to the base
    val floor = fold.map(_.maxBatch).getOrElse(Long.MinValue)
    val major = gens.isEmpty || baseRatio <= 0.0 ||
      gens.size >= maxGens || {
        val baseBytes = pathBytes(hfs, s"$idxDir/${gens.head}")
        val tailBytes = gens.tail.map(g => pathBytes(hfs, s"$idxDir/$g")).sum +
          srcIds.map(b => pathBytes(hfs, s"$idxDir/banded/batch=$b") +
            pathBytes(hfs, s"$idxDir/shingled/batch=$b")).sum
        tailBytes >= baseRatio * baseBytes
      }
    val cur =
      if (major) loadIndex(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"foldIndex: no index at $idxDir — nothing has been ingested"))
      else {
        // minor source: the unfolded batch shards ONLY — the batch >
        // floor predicate is a partition filter, so folded dirs and
        // replay leftovers are pruned, never scanned
        require(srcIds.nonEmpty, "foldIndex: minor fold with no batches")
        Dedup.LshIndex(
          spark.read.parquet(s"$idxDir/banded")
            .where(col("batch") > floor).drop("batch"),
          spark.read.parquet(s"$idxDir/shingled")
            .where(col("batch") > floor).drop("batch"))
      }
    val name = s"base-${java.util.UUID.randomUUID().toString}"
    // a minor fold RETAINS the prior generations and appends; a major
    // fold consumes them all
    val newGens = if (major) Seq(name) else gens :+ name
    // sources recorded in the marker: batch ids always; for a major fold
    // also the consumed generation names (the crashed/lost discriminator
    // then requires ALL of them on disk to call a pointerless base
    // "crashed")
    val srcTokens = srcIds.sorted.map(_.toString) ++
      (if (major) gens else Seq.empty)
    // the fold's SOURCE batch ids, recorded INSIDE the base generation
    // FIRST — before the (multi-second) component writes, not after them
    // (r12 ADVICE): they let loadIndex distinguish a crashed fold
    // (pointer never written; EVERY source dir still on disk — the
    // batch-dir view is complete, proceed and let the next fold sweep
    // the orphan) from a LOST pointer (fold completed, cleanup deleted
    // the sources — proceeding would silently forget the folded
    // history; fail loudly). srcIds are known up-front, so writing the
    // marker first shrinks the marker-less-orphan window from the whole
    // parquet-write span to a single tiny file create — a crash anywhere
    // mid-fold now leaves a discriminable 'crashed' orphan that the next
    // fold sweeps automatically, instead of a loud restart-blocking base.
    // The FULL id set, not just the boundary: a checkpoint replay
    // re-creates a strict SUBSET of the folded dirs, and boundary-only
    // presence would misread lost-after-replay as crashed (r12 review
    // finding).
    graft.io.AtomicPointer.writeSmall(hfs,
      new org.apache.hadoop.fs.Path(s"$idxDir/$name/_FOLDED_UPTO"),
      srcTokens.mkString(","))
    cur.banded.write.parquet(s"$idxDir/$name/banded")
    cur.shingles.write.parquet(s"$idxDir/$name/shingled")
    val pointerContent = s"$upToBatch ${newGens.mkString(",")}"
    // FENCED flip (r11 verdict 3): the fold fails loudly if a concurrent
    // maintainer's flip interleaved — a silently lost fold generation
    // would dedup the next batches against a stale boundary
    graft.io.AtomicPointer.flipFenced(hfs,
      spark.sparkContext.hadoopConfiguration, idxDir, "FOLDED",
      pointerContent)
    // cleanup after the flip: superseded + orphan generations (anything
    // not in the LIVE list — a minor fold retains its predecessors),
    // folded batch dirs (also catches replay leftovers at or below the
    // boundary); stray non-protocol names (batch=3.bak) are not ours to
    // delete
    val live = newGens.toSet
    Option(hfs.listStatus(new org.apache.hadoop.fs.Path(idxDir)))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .foreach { st =>
        val n = st.getPath.getName
        if ((st.isDirectory && n.startsWith("base-") && !live.contains(n)) ||
            // crash-orphaned per-flip pointer tmps (uuid-suffixed)
            (!st.isDirectory && n.startsWith(".FOLDED.tmp")))
          hfs.delete(st.getPath, true)
      }
    Seq("banded", "shingled").foreach { sub =>
      Option(hfs.listStatus(
          new org.apache.hadoop.fs.Path(s"$idxDir/$sub")))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .foreach { st =>
          if (st.isDirectory &&
              parseBatchDir(st.getPath.getName).exists(_ <= upToBatch))
            hfs.delete(st.getPath, true)
        }
    }
    graft.io.AtomicPointer.clearAside(hfs, idxDir, "FOLDED")

    // end-of-maintenance self-check, the fold analogue of the IVF loop's
    // finalizeMaintenance: the pointer must still name OUR base and the
    // base must still exist — a concurrent folder's cleanup deleting it
    // as "superseded" is caught here instead of surfacing as a mystery
    // read failure three batches later (detection, not locking; the
    // serial-foreachBatch deployment makes this a no-op in practice)
    graft.io.AtomicPointer.verifyOwn(hfs, idxDir, "FOLDED",
      pointerContent)
    for (g <- newGens; sub <- Seq("banded", "shingled")) {
      if (!hfs.exists(new org.apache.hadoop.fs.Path(s"$idxDir/$g/$sub")))
        throw new IllegalStateException(
          s"foldIndex: live generation $idxDir/$g lost its $sub component " +
            "after the flip — a concurrent maintainer's cleanup destroyed " +
            "it (single-writer contract breached); rebuild the index")
    }
  }

  /** The EFFECTIVE index: the folded base generation (when the FOLDED
    * pointer exists) plus strictly-newer batch shards — never a replayed
    * dir at or below the fold boundary, whose rows would double-count
    * bucket sizes against the `maxBucket` skew guard. */
  private def loadIndex(spark: SparkSession,
                        dir: String): Option[Dedup.LshIndex] = {
    val banded = new org.apache.hadoop.fs.Path(s"$dir/index/banded")
    val hfs = fs(spark, dir)
    readFold(spark, dir) match {
      case None =>
        // A base generation on disk with NO pointer is one of two states:
        //  - a CRASHED fold (died before its flip): EVERY source batch
        //    dir is still on disk (a fold deletes nothing pre-commit),
        //    so the batch-dir view is complete and correct — proceed;
        //    the next successful fold sweeps the orphan (a crash window
        //    the at-least-once design supports must self-heal);
        //  - a LOST pointer (fold committed, cleanup deleted the folded
        //    batch dirs, pointer later destroyed): deduping against only
        //    the remaining batch dirs silently forgets the folded
        //    history forever — fail loudly (r11 advice).
        // Discriminated by the base's _FOLDED_UPTO source-id list
        // (written before the flip): crashed = ALL listed ids still have
        // their dirs. Subset presence is NOT crashed — a checkpoint
        // replay re-creates only the replayed batch's dir, so
        // lost-after-replay leaves a strict subset (r12 review finding).
        // A base with NO readable id list (pre-r12 legacy, or torn
        // inside the single tiny marker create that now PRECEDES the
        // component writes — r13) is not discriminable and stays LOUD —
        // the fail-safe posture for a dedup-completeness guard; a legacy
        // crashed-fold orphan needs one manual delete of the base dir.
        val bases =
          (try Option(hfs.listStatus(
              new org.apache.hadoop.fs.Path(s"$dir/index")))
            .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus]).toSeq
          // an un-seeded stream's first batch: no index dir yet — that is
          // the legitimate "nothing ingested" state, not a lost pointer
          catch { case _: java.io.FileNotFoundException =>
            Seq.empty[org.apache.hadoop.fs.FileStatus] })
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("base-"))
          .map(_.getPath.getName)
        lazy val batchSet = unfoldedBatches(spark, dir, None).toSet
        val baseSet = bases.toSet
        val lost = bases.filter { b =>
          // marker tokens: batch ids always; a MAJOR tiered fold also
          // lists the generation names it consumed — "crashed" requires
          // EVERY listed source (dir or generation) still on disk
          val srcs: Option[(Seq[Long], Seq[String])] =
            try {
              val toks = graft.io.AtomicPointer.readSmall(hfs,
                  new org.apache.hadoop.fs.Path(
                    s"$dir/index/$b/_FOLDED_UPTO"))
                .split(",").map(_.trim).filter(_.nonEmpty)
              val (genToks, idToks) = toks.partition(_.startsWith("base-"))
              val ids = idToks.flatMap(t => scala.util.Try(t.toLong).toOption)
              if (toks.nonEmpty && ids.length == idToks.length &&
                  genToks.forall(validGenName))
                Some((ids.toSeq, genToks.toSeq))
              else None
            } catch { case _: java.io.IOException => None }
          srcs match {
            case Some((ids, gs)) =>
              !(ids.forall(batchSet.contains) && gs.forall(baseSet.contains))
            case None => true
          }
        }
        if (lost.nonEmpty) throw new IllegalStateException(
          s"dedup index at $dir/index has folded generation(s) " +
            s"${lost.sorted.mkString(",")} but no FOLDED pointer, and " +
            "their source batch dirs are not (fully) on disk — the " +
            "pointer was lost (deletion or partial restore), and deduping " +
            "against only the unfolded batches would silently miss every " +
            "duplicate in the folded history. Restore the pointer " +
            "(content: '<maxFoldedBatch> <gen1>,<gen2>,...'), or — if the " +
            "fold provably never committed (legacy pre-marker orphan) — " +
            "delete the base dir; otherwise rebuild the index.")
        if (!hfs.exists(banded)) None
        else Some(Dedup.LshIndex(
          spark.read.parquet(s"$dir/index/banded").drop("batch"),
          spark.read.parquet(s"$dir/index/shingled").drop("batch")))
      case Some(f) =>
        // all live generations (base + minor-fold siblings) union equally
        val baseB = f.gens.map(g =>
          spark.read.parquet(s"$dir/index/$g/banded")).reduce(_ unionByName _)
        val baseS = f.gens.map(g =>
          spark.read.parquet(s"$dir/index/$g/shingled")).reduce(_ unionByName _)
        if (unfoldedBatches(spark, dir, Some(f)).isEmpty)
          Some(Dedup.LshIndex(baseB, baseS))
        else Some(Dedup.LshIndex(
          // the batch > boundary predicate is a partition filter — the
          // replay-leftover dirs are pruned, not scanned
          baseB.unionByName(spark.read.parquet(s"$dir/index/banded")
            .where(col("batch") > f.maxBatch).drop("batch")),
          baseS.unionByName(spark.read.parquet(s"$dir/index/shingled")
            .where(col("batch") > f.maxBatch).drop("batch"))))
    }
  }
}
