package graft.rank

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{RankDiscount, TopK}

/** Neighbor retrieval + vote scoring (SURVEY §2.2 P4/P5, §2.5 W3, §2.4 A9,
  * §2.3 J8/J9) — the set-oriented form of the reference's per-user scoring
  * loop (`recommend_User_Book`, guessLike_u_like.py:106-129). The single
  * biggest architectural win over the reference: the same scoring DAG runs
  * for ALL query users at once (SURVEY §3.3), instead of a driver-side
  * Python loop.
  *
  * Similarity is computed cluster-locally: postings are keyed by
  * (cluster, term), so the shuffle partitions by cluster and term — the
  * reference's search-space pruning (only score within the predicted
  * cluster) becomes a join-key restriction that scales horizontally.
  */
object Scoring {

  /** Cosine similarities between query users and corpus users within the
    * same cluster.
    *
    * queries: (userId, cluster, tokens array) — the users to score.
    * corpus:  (userId, cluster, tokens array) — the model users.
    * Returns (query, neighbor, sim) for same-cluster pairs, self excluded.
    *
    * `broadcastQueries`: set from a micro-batch serving loop, where the
    * query side is a few hundred events but has NO size statistics (it
    * derives from a streaming batch, so the planner assumes big and
    * sort-merge-joins — reshuffling the entire corpus postings index
    * every batch). The explicit hint turns the postings join into a
    * BroadcastHashJoin that STREAMS the persisted index with zero
    * exchange; only the matched pairs shuffle for the aggregation, so
    * batch latency scales with batch fanout, not corpus size. Leave
    * false for batch scoring (DailyLogJob), where the query side is the
    * whole user base. */
  def clusterCosine(queries: DataFrame, corpus: DataFrame,
                    vocab: Option[Set[String]] = None,
                    corpusPostings: Option[DataFrame] = None,
                    broadcastQueries: Boolean = false): DataFrame = {
    // Micro-batch lane: the query side is batch-bounded, so its postings
    // (tf + norm per user) are computed LOCALLY instead of through
    // termPostings' three shuffle stages — identical numbers (tf counts
    // and tf² are integer-valued doubles, so every sum is exact in any
    // order; the vocab index is the same sorted mapping termPostings
    // uses), materialized as a local relation the join naturally
    // broadcasts. Batch lane: distributed termPostings, unchanged.
    val q0 =
      if (broadcastQueries && vocab.isDefined) {
        val spark = queries.sparkSession
        import spark.implicits._
        val vocabIdx: Map[String, Int] =
          vocab.get.toSeq.sorted.zipWithIndex.toMap
        val rows = queries
          .select(col("userId").cast("long"), col("cluster").cast("int"),
            col("tokens").cast("array<string>"))
          .as[(Long, Int, Seq[String])].collect()
          .flatMap { case (uid, cl, toks) =>
            val (tf, norm) = localTf(toks, vocabIdx)
            tf.iterator.map { case (i, f) => (cl, i, uid, f, norm) }
          }.toSeq
        spark.createDataset(rows)
          .toDF("cluster", "term", "query", "tfq", "nq")
      } else
        termPostings(queries, vocab).select(col("cluster"), col("term"),
          col("userId").as("query"), col("tf").as("tfq"), col("norm").as("nq"))
    val q = if (broadcastQueries) broadcast(q0) else q0
    // the corpus side is batch-invariant: a serving deployment precomputes
    // it ONCE (the reference's "per-cluster similarity index", its 66 s
    // build stage) and passes it here per micro-batch — see
    // [[graft.jobs.ServeJob.start]]
    val cRaw = corpusPostings.getOrElse(termPostings(corpus, vocab))
    // the term-index bijection only holds if BOTH sides were indexed with
    // the SAME vocabulary — a refreshed model joined against a stale
    // persisted postings index would silently misalign every term after
    // the first differing entry. The fingerprint stamped by termPostings
    // makes that loud: a per-row codegen'd int comparison, no extra job.
    require(vocab.isDefined || !cRaw.columns.contains(VocabFpCol),
      "clusterCosine: corpusPostings are term-indexed (built with a " +
        "vocab) but no vocab was passed for the query side — the join " +
        "would compare int indices against raw term strings")
    // ... and the mirror image (r9 advice): a vocab on the query side with
    // externally supplied STRING-term postings (built with vocab=None, so
    // no fingerprint column) would join int indices against raw strings,
    // match nothing, and silently push every user to the fallback.
    require(vocab.isEmpty || corpusPostings.isEmpty ||
        cRaw.columns.contains(VocabFpCol),
      "clusterCosine: a vocab was passed but the supplied corpusPostings " +
        "carry no vocabulary fingerprint (they were built with " +
        "vocab=None, i.e. string terms) — the int-indexed query side " +
        "would match nothing; rebuild the postings with the current vocab")
    val cChecked =
      if (vocab.isDefined && cRaw.columns.contains(VocabFpCol))
        cRaw.where(when(col(VocabFpCol) === lit(vocabFingerprint(vocab.get)),
          lit(true)).otherwise(raise_error(lit(
          "clusterCosine: corpusPostings were built with a DIFFERENT " +
            "vocabulary than the one passed — term indices would silently " +
            "misalign; rebuild the postings with the current vocab"))))
      else cRaw
    val c = cChecked
      .select(col("cluster"), col("term"),
        col("userId").as("neighbor"), col("tf").as("tfc"), col("norm").as("nc"))
    q.join(c, Seq("cluster", "term"))
      .where(col("query") =!= col("neighbor"))
      .groupBy("query", "neighbor")
      .agg((sum(col("tfq") * col("tfc")) / (first("nq") * first("nc"))).as("sim"))
  }

  /** (userId, cluster, term, tf, norm) posting lists for a (userId,
    * cluster, tokens) frame — the similarity index [[clusterCosine]] joins
    * on. Exposed so the STATIC corpus side can be computed once per model
    * deployment instead of once per scoring call: at 100 TB this is a
    * materialized table bucketed by (cluster, term); in a live stream it
    * is a stream-lifetime persist owned by the serving job. */
  def termPostings(df: DataFrame, vocab: Option[Set[String]] = None): DataFrame = {
    val exploded = df.select(col("userId"), col("cluster"),
      explode(col("tokens")).as("term"))
    val pruned = vocab match {
      case Some(v) =>
        // vocab pruning doubles as TERM INDEXING: the broadcast carries a
        // deterministic index (sorted vocab order) and postings keep the
        // int index as `term`, so the (cluster, term) similarity join and
        // aggregation hash 4-byte ints instead of term strings — same
        // sims (the index is a bijection on the vocabulary), leaner
        // shuffle rows, faster hashing on both the serving and batch
        // paths. Both sides of any join index identically because both
        // come through this function with the same vocab.
        val vdf = exploded.sparkSession.createDataFrame(
          v.toSeq.sorted.zipWithIndex).toDF("term", "__tidx")
        exploded.join(broadcast(vdf), Seq("term"))
          .select(col("userId"), col("cluster"), col("__tidx").as("term"))
      case None => exploded
    }
    val tf = pruned.groupBy("userId", "cluster", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val norms = tf.groupBy("userId")
      .agg(sqrt(sum(col("tf") * col("tf"))).as("norm"))
    val joined = tf.join(norms, "userId")
    // indexed postings carry their vocabulary's fingerprint so a consumer
    // can verify both join sides were indexed by the SAME vocab
    vocab.fold(joined)(v =>
      joined.withColumn(VocabFpCol, lit(vocabFingerprint(v))))
  }

  /** Column stamped onto vocab-indexed postings by [[termPostings]]. */
  val VocabFpCol = "__vocab_fp"

  private def vocabFingerprint(v: Set[String]): Int =
    scala.util.hashing.MurmurHash3.orderedHash(v.toSeq.sorted)

  /** tf accumulation in vocab-index space + L2 norm — the SINGLE local
    * implementation every localized lane shares (the fused/exchange
    * parity surface; a per-lane copy is how the lanes silently drift).
    * Null token arrays behave exactly like the exchange lane's
    * `explode`: no terms, so the row falls through to its fallback
    * instead of throwing. */
  private[rank] def localTf(toks: Seq[String], idx: Map[String, Int])
      : (scala.collection.mutable.HashMap[Int, Double], Double) = {
    val tf = scala.collection.mutable.HashMap.empty[Int, Double]
    if (toks != null) toks.foreach(t => idx.get(t).foreach(i =>
      tf(i) = tf.getOrElse(i, 0.0) + 1.0))
    (tf, math.sqrt(tf.valuesIterator.map(x => x * x).sum))
  }

  /** W3: keep each query's top `fraction` of neighbors (floor semantics,
    * guessLike_u_like.py:114-115), ranked by sim desc / neighbor asc.
    * `minKeep` floors the kept count so small clusters still vote (the
    * engine's refinement — the reference emits nothing for tiny clusters
    * and falls back to hot books). */
  def topNeighbors(sims: DataFrame, fraction: Double, minKeep: Int = 1): DataFrame =
    TopK.topFractionPerKey(sims, Seq("query"),
        Seq(round(col("sim"), 9).desc, col("neighbor").asc),
        fraction, minKeep = minKeep)
      .select("query", "neighbor", "sim", "rank")

  /** A9: neighbors' books vote with rank-discounted scores; returns
    * (query, bookId, score) — `neighborBooks` is (userId, books array). */
  def discountedBookVotes(neighbors: DataFrame, neighborBooks: DataFrame): DataFrame = {
    val votes = neighbors
      .join(neighborBooks.select(col("userId").as("neighbor"), col("books")), "neighbor")
      .select(col("query"), col("rank"), col("sim"), explode(col("books")).as("bookId"))
    RankDiscount.discountedVotes(votes, Seq("query"), "bookId", "sim",
        Seq(col("rank").asc), out = "score")
      .select(col("query"), col("bookId"), col("score"))
  }

  /** W2: cap the candidate list per query (top-100 of the reference,
    * guessLike_u_like.py:126). */
  def topCandidates(votes: DataFrame, cap: Int): DataFrame =
    TopK.topKPerKey(votes, Seq("query"),
      Seq(round(col("score"), 9).desc, col("bookId").asc), cap)

  /** Deployment-lifetime broadcast SERVE INDEX: the corpus postings
    * inverted to (cluster, term) → [(neighbor, tf, norm)] — the engine
    * form of the reference's in-memory per-cluster similarity index.
    * Model-sized (bounded by the fit, like [[ServeIndex]]'s book map),
    * built once per deployment from the postings frame [[termPostings]]
    * produces with a vocab (int term indices). With it,
    * [[fusedServeScore]] scores a micro-batch with ZERO distributed
    * shuffles: per-batch cost stops including the O(index) postings
    * scan every trigger and becomes O(batch × matched postings). */
  private def buildServeIndex(postings: DataFrame)
      : org.apache.spark.broadcast.Broadcast[Map[Long, Array[(Long, Double, Double)]]] = {
    val spark = postings.sparkSession
    import spark.implicits._
    val rows = postings.select(col("cluster").cast("int"),
        col("term").cast("int"), col("userId").cast("long"),
        col("tf").cast("double"), col("norm").cast("double"))
      .as[(Int, Int, Long, Double, Double)].collect()
    val m: Map[Long, Array[(Long, Double, Double)]] = rows
      .groupBy(r => (r._1.toLong << 32) | (r._2.toLong & 0xffffffffL))
      .map { case (k, arr) => k -> arr.map(r => (r._3, r._4, r._5)) }
    spark.sparkContext.broadcast(m)
  }

  /** ZERO-SHUFFLE micro-batch scoring over the broadcast serve index —
    * the latency end-state of the serving lane (measured lineage:
    * exchange pipeline ≈ 4 s/batch → fused-with-postings-join ≈ 1.7 s →
    * this ≈ the per-row work). One narrow map over the (localized,
    * batch-bounded) queries: per query, tf/norm locally, walk the probed
    * posting lists out of the broadcast, accumulate neighbor dots, then
    * the same local finish as the exchange pipeline's [[topNeighbors]] →
    * [[discountedBookVotes]] → [[topCandidates]] chain. Numerically
    * IDENTICAL to the exchange path: tf·tf products are integer-valued
    * doubles (exact sums in any order), norms and sims divide the same
    * exact sums, ranking uses the same Catalyst-parity rounding —
    * FusedScoringSpec pins equality.
    *
    * Scale shape: the index and book map are model-sized broadcasts (the
    * fit bounds them, not the corpus); the job is |batch| rows × one
    * task-local walk — horizontally scalable with batch size and immune
    * to corpus growth except through the fitted model itself. */
  def fusedServeScore(queries: DataFrame, serve: ServeIndex,
                      topFraction: Double, candidateCap: Int,
                      similarUserCap: Int,
                      minKeep: Int = 1): (DataFrame, DataFrame) = {
    val vocabIdx = serve.vocabIdx
    val index = serve.postings
    val bookMap = serve.books
    val spark = queries.sparkSession
    import spark.implicits._
    // the fused lane's contract is micro-batch (trigger-bounded) input;
    // enforce it like Blend.collectHotIds does instead of letting a
    // batch-scale caller OOM the driver through an unbounded collect
    val qrows = queries
      .select(col("userId").cast("long"), col("cluster").cast("int"),
        col("tokens").cast("array<string>"))
      .limit(MaxServeBatchRows + 1)
      .as[(Long, Int, Seq[String])].collect()
    require(qrows.length <= MaxServeBatchRows,
      s"fusedServeScore got more than $MaxServeBatchRows query rows — " +
        "this is the micro-batch serving lane; score batch-scale inputs " +
        "through the distributed exchange lane (clusterCosine)")
    val nTasks = math.max(1, math.min(32, qrows.length))
    val scored = spark.createDataset(qrows.toSeq)
      .repartition(nTasks)
      .mapPartitions { it =>
        def r9(x: Double): Double =
          java.math.BigDecimal.valueOf(x)
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        it.map { case (uid, cl, toks) =>
          val (tf, nq) = localTf(toks, vocabIdx.value)
          val dots = scala.collection.mutable.HashMap.empty[Long, Double]
          val norms = scala.collection.mutable.HashMap.empty[Long, Double]
          tf.foreach { case (t, f) =>
            index.value.get((cl.toLong << 32) | (t.toLong & 0xffffffffL))
              .foreach(_.foreach { case (n, fc, nc) =>
                if (n != uid) {
                  dots(n) = dots.getOrElse(n, 0.0) + f * fc
                  norms(n) = nc
                }
              })
          }
          val ranked = dots.iterator
            .map { case (n, d) => (n, d / (nq * norms(n))) }.toArray
            .sortBy { case (n, s) => (-r9(s), n) }
          val keep = math.min(ranked.length,
            math.max(math.floor(ranked.length * topFraction).toInt, minKeep))
          val occ = scala.collection.mutable.HashMap.empty[Long, Int]
          val score = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
          var i = 0
          while (i < keep) {
            val (n, s) = ranked(i)
            bookMap.value.getOrElse(n, Seq.empty).foreach { b =>
              val k = occ.getOrElse(b, 0) + 1
              occ(b) = k
              score(b) = score.getOrElse(b, 0.0) + s / math.log(k + 1.0)
            }
            i += 1
          }
          val cand = score.toArray.sortBy { case (b, sc) => (-r9(sc), b) }
            .take(candidateCap).zipWithIndex
            .map { case ((b, sc), idx) => (b, sc, idx + 1) }
          val users = ranked.take(similarUserCap).map(_._1)
          (uid, cand, users)
        }
      }.collect()
    val candidates = spark.createDataset(
      scored.flatMap { case (q, cand, _) =>
        cand.map { case (b, sc, r) => (q, b, sc, r) } }.toSeq)
      .toDF("query", "bookId", "score", "rank")
    // exchange-lane parity: similarUsers aggregates over sims, so a query
    // with ZERO neighbors (singleton cluster, no shared vocab terms) has
    // no row at all — and Blend.withUserFallback serves it defaultUsers.
    // Emitting a (query, []) row here would instead serve an empty list;
    // omit neighbor-less queries so both lanes hit the same fallback.
    val users = spark.createDataset(
        scored.collect { case (q, _, u) if u.nonEmpty => (q, u.toSeq) }.toSeq)
      .toDF("query", "users")
    (candidates, users)
  }

  /** The deployment-lifetime broadcast assets the serving lane needs:
    * vocabulary index (same sorted mapping [[termPostings]] uses),
    * inverted postings, the fitted userBooks map, the users' latest-k
    * and collected-book maps (the reference holds exactly these in
    * Redis), the book documents, the CountVectorizer vocabulary index
    * (model order, for cluster prediction) and the fitted KMeans model.
    * All model-sized — bounded by the fit, not the corpus. `destroy()`
    * when the deployment ends. */
  final case class ServeIndex(
      vocabIdx: org.apache.spark.broadcast.Broadcast[Map[String, Int]],
      postings: org.apache.spark.broadcast.Broadcast[Map[Long, Array[(Long, Double, Double)]]],
      books: org.apache.spark.broadcast.Broadcast[Map[Long, Seq[Long]]],
      latest: org.apache.spark.broadcast.Broadcast[Map[Long, Seq[Long]]],
      own: org.apache.spark.broadcast.Broadcast[Map[Long, Seq[Long]]],
      docs: org.apache.spark.broadcast.Broadcast[Map[Long, String]],
      cvIdx: org.apache.spark.broadcast.Broadcast[Map[String, Int]],
      km: org.apache.spark.ml.clustering.KMeansModel,
      /** the latest-k depth the `latest` map was built with — a serving
        * caller passing a different depth would silently get different
        * query contexts than the batch lane, so scoreBatch REQUIRES a
        * match (ADVICE r8). */
      latestK: Int = 3) {
    def destroy(): Unit = {
      vocabIdx.destroy(); postings.destroy(); books.destroy()
      latest.destroy(); own.destroy(); docs.destroy(); cvIdx.destroy()
    }
  }

  /** Build every [[ServeIndex]] asset once per deployment — each is one
    * distributed job over fit-bounded or snapshot tables, collected to a
    * broadcast. `snapshot` is the collect table the deployment serves
    * against; `latestK` matches the serving query-context depth. */
  def buildServeAssets(fitted: graft.jobs.RecommenderModel.Fitted,
                       snapshot: DataFrame, latestK: Int = 3): ServeIndex = {
    val spark = fitted.userBooks.sparkSession
    import spark.implicits._
    val vocab = fitted.cv.vocabulary.toSet
    val postingsDf = termPostings(fitted.userTokens, Some(vocab))
    val vocabIdx = spark.sparkContext.broadcast(
      vocab.toSeq.sorted.zipWithIndex.toMap)
    val books = spark.sparkContext.broadcast(
      fitted.userBooks.select(col("userId").cast("long"),
          col("books").cast("array<long>"))
        .as[(Long, Seq[Long])].collect().toMap)
    val latest = spark.sparkContext.broadcast(
      graft.prep.Collections.latestBooks(snapshot, latestK)
        .select(col("userId").cast("long"), col("books").cast("array<long>"))
        .as[(Long, Seq[Long])].collect().toMap)
    val own = spark.sparkContext.broadcast(
      snapshot.where(col("isCollect") === 1)
        .groupBy("userId").agg(collect_set(col("bookId")).as("books"))
        .select(col("userId").cast("long"), col("books").cast("array<long>"))
        .as[(Long, Seq[Long])].collect().toMap)
    val docs = spark.sparkContext.broadcast(
      fitted.bookDocs.select(col("bookId").cast("long"), col("doc"))
        .as[(Long, String)].collect().toMap)
    val cvIdx = spark.sparkContext.broadcast(
      fitted.cv.vocabulary.zipWithIndex.toMap)
    ServeIndex(vocabIdx, buildServeIndex(postingsDf), books,
      latest, own, docs, cvIdx, fitted.km, latestK)
  }

  /** Default byte budget for the fused lane's deployment broadcasts
    * (2 GiB — comfortably inside a driver/executor heap share while far
    * above any fit-bounded model this engine targets). */
  val DefaultServeBudgetBytes: Long = 2L << 30

  /** Micro-batch row bound for [[fusedServeScore]]'s driver collect —
    * generous for any trigger-bounded stream batch, a loud stop for a
    * batch-scale caller that should be on the exchange lane. */
  val MaxServeBatchRows: Int = 1 << 20

  /** The BUILD transiently holds more than the steady-state broadcasts
    * the estimate models: buildServeIndex collects an Array of
    * unspecialized Tuple5 rows (~2× the steady posting bytes), then
    * groups into a second structure while the first is still referenced,
    * plus the serialized broadcast copy — peak ≈ 3× steady. The guard
    * compares against the budget with this factor applied so "estimate
    * passed" means the BUILD fits, not just the result. */
  val TransientBuildFactor: Long = 3L

  // JVM-heap cost model for the collected broadcast maps (conservative:
  // boxed values + HashMap entry overhead, measured orders not decimals)
  private val BytesPerMapEntry = 64L   // HashMap.Entry + key box + refs
  private val BytesPerSeqId    = 24L   // boxed Long element in a Seq
  private val BytesPerPosting  = 80L   // Tuple3(Long, Double, Double) boxed
  private val BytesPerChar     = 2L    // String payload

  /** Conservative JVM-heap estimate (bytes) of everything
    * [[buildServeAssets]] would collect and broadcast. The maps are NOT
    * all model-sized: `latest`/`own` scale with the active-user count and
    * `docs` with the catalog, so at 100× users an unconditional collect
    * is a multi-GB broadcast and eventually a driver OOM. This estimate
    * costs a few small aggregation jobs (no full shuffles: per-row array
    * sizes summed, approx-distinct for user counts) and lets
    * [[buildServeAssetsGuarded]] refuse the fused lane BEFORE any
    * collect happens. */
  def estimateServeAssetBytes(fitted: graft.jobs.RecommenderModel.Fitted,
                              snapshot: DataFrame, latestK: Int = 3): Long = {
    def stats(df: DataFrame, payload: Column): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(sum(payload), lit(0L)).as("p")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (nBooks, idsBooks) =
      stats(fitted.userBooks, size(col("books")).cast("long"))
    val (nDocs, charsDocs) =
      stats(fitted.bookDocs, length(col("doc")).cast("long"))
    // postings upper bound without the 3-shuffle termPostings job:
    // distinct tokens per user, summed (vocab pruning only shrinks it)
    val nPostings = fitted.userTokens
      .agg(coalesce(sum(size(array_distinct(col("tokens"))).cast("long")),
        lit(0L))).head().getLong(0)
    // snapshot-proportional maps: rows bound the collected-set ids, an
    // approx-distinct bounds the user-entry count
    val snapStats = snapshot.where(col("isCollect") === 1)
      .agg(count(lit(1)).as("rows"),
        approx_count_distinct(col("userId")).as("users")).head()
    val snapRows = snapStats.getLong(0)
    // approx_count_distinct has ~5% rsd, and an UNDERcount here makes the
    // OOM guard optimistic — inflate by 20% (≈4σ), capped by the exact
    // row count (distinct users can never exceed rows)
    val snapUsers = math.min(snapStats.getLong(1) * 6L / 5L, snapRows)
    val vocabBytes = fitted.cv.vocabulary.length.toLong *
      (BytesPerMapEntry + 32L) * 2L // vocabIdx + cvIdx, ~32B avg term
    vocabBytes +
      nPostings * BytesPerPosting +
      nBooks * BytesPerMapEntry + idsBooks * BytesPerSeqId +
      snapUsers * BytesPerMapEntry * 2L +                // latest + own keys
      // latest ids: ≤ latestK per user AND ≤ one per snapshot row — the
      // UPPER bound must not cap latestK (an optimistic estimate is how
      // an OOM guard fails to guard)
      math.min(snapUsers * latestK.toLong, snapRows) * BytesPerSeqId +
      snapRows * BytesPerSeqId +                         // own ids (≤ rows)
      nDocs * BytesPerMapEntry + charsDocs * BytesPerChar
  }

  /** [[buildServeAssets]] behind a byte budget: estimate the broadcast
    * footprint FIRST and return None (→ the caller serves through the
    * spec-equal distributed exchange lane) when the estimate times
    * [[TransientBuildFactor]] exceeds `maxBytes` — the guard must refuse
    * builds whose transient peak would OOM, not just oversized results.
    * The fused lane is a latency optimization valid only while the
    * deployment state is genuinely broadcast-sized — this is the guard
    * that makes the lane selection automatic instead of manual. */
  def buildServeAssetsGuarded(fitted: graft.jobs.RecommenderModel.Fitted,
                              snapshot: DataFrame, latestK: Int = 3,
                              maxBytes: Long = DefaultServeBudgetBytes)
      : Option[ServeIndex] = {
    val est = estimateServeAssetBytes(fitted, snapshot, latestK)
    if (est > maxBytes / TransientBuildFactor) None
    else Some(buildServeAssets(fitted, snapshot, latestK))
  }

  /** Local replication of the per-user query-document assembly + cluster
    * assignment over the [[ServeIndex]] broadcasts — the batch lane's
    * userDocs → CountVectorizer.transform → KMeansModel.transform chain
    * without a single distributed job. Semantics parity, piece by piece:
    * inner-join drop of unknown book ids; (bookId, doc) sorted assembly;
    * whitespace squeeze; whitespace tokenization; CV counts in MODEL
    * vocabulary order; cluster via the model's own single-vector
    * `predict` (same code path its transform UDF runs). Returns None for
    * users whose books all miss the doc table (they fall through to the
    * hot fallback, as in the batch lane). */
  def localAssign(serve: ServeIndex, userId: Long, books: Seq[Long])
      : Option[(Long, Int, Seq[String])] = {
    val pairs = books.flatMap(b => serve.docs.value.get(b).map(d => (b, d)))
    if (pairs.isEmpty) return None
    val doc = pairs.sorted.map(_._2).mkString(" ")
      .replaceAll("\\s+", " ").trim
    val tokens: Seq[String] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        doc.split("\\s+"))
    val counts = scala.collection.mutable.HashMap.empty[Int, Double]
    tokens.foreach(t => serve.cvIdx.value.get(t).foreach(i =>
      counts(i) = counts.getOrElse(i, 0.0) + 1.0))
    val idx = counts.keys.toArray.sorted
    val vec = org.apache.spark.ml.linalg.Vectors.sparse(
      serve.cvIdx.value.size, idx, idx.map(counts))
    Some((userId, serve.km.predict(vec), tokens))
  }

  /** Top-`k` similar users per query (u_similar:{uid}, top-40 —
    * guessLike_u_like.py:128,213). */
  def similarUsers(sims: DataFrame, k: Int): DataFrame =
    TopK.topKPerKey(sims, Seq("query"),
        Seq(round(col("sim"), 9).desc, col("neighbor").asc), k)
      .groupBy("query")
      .agg(collect_list(struct(col("rank"), col("neighbor"))).as("rn"))
      .select(col("query"),
        transform(sort_array(col("rn")), x => x.getField("neighbor")).as("users"))
}
