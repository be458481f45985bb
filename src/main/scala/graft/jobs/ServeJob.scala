package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.functions.TextFunctions
import graft.io.{EventSource, KVSink, KVWriter}
import graft.prep.Collections

/** Entry point 3.2 — streaming event-triggered recommendations
  * (SURVEY §3.2, §2.8). One parameterized job covers the reference's three
  * near-identical services:
  *
  *  - u_like / u_nlike (guessLike_u_like.py, guessLike_u_nlike.py): event
  *    carries userId; the query context is the user's latest 3 collected
  *    books (stream-static join against the collect snapshot, S4/J10);
  *    recommendations exclude already-collected books (P7).
  *  - u_first_select (guessLike_u_first_select.py): event carries bookIds
  *    inline (UFS:178); no collected-filter (UFS:182).
  *
  * The fitted model is immutable for the life of the stream (ST4) —
  * the reference refits only on restart; refresh = resubmit with a new
  * Fitted. Per-batch processing is set-oriented: all events in a
  * micro-batch score as one DataFrame (ST3 upgrade from the reference's
  * strictly sequential loop), and KV writes happen in foreachBatch
  * (at-least-once, K2).
  */
object ServeJob {

  /** The reference's three deployables, as named constructors over the one
    * parameterized job (recommender-online/README.md:2):
    *  - u_like (guessLike_u_like.py): collect event → latest-3 context,
    *    collected books filtered from results;
    *  - u_nlike (guessLike_u_nlike.py): un-collect event → identical plan
    *    over the post-event collect state;
    *  - u_first_select (guessLike_u_first_select.py): bookIds arrive in
    *    the payload, results unfiltered (UFS:178,182). */
  def uLike(frames: DataFrame, fitted: RecommenderModel.Fitted,
            collect: DataFrame, kv: KVSink): StreamingQuery =
    start(frames, fitted, collect, kv, filterCollected = true)

  def uNlike(frames: DataFrame, fitted: RecommenderModel.Fitted,
             collect: DataFrame, kv: KVSink): StreamingQuery =
    start(frames, fitted, collect, kv, filterCollected = true)

  def uFirstSelect(frames: DataFrame, fitted: RecommenderModel.Fitted,
                   collect: DataFrame, kv: KVSink): StreamingQuery =
    start(frames, fitted, collect, kv, filterCollected = false)

  /** Score one micro-batch of decoded events (userId, bookIds).
    * `corpusPostings`: the precomputed similarity index
    * ([[graft.rank.Scoring.termPostings]] over `fitted.userTokens`) — the
    * streaming path passes it so the static corpus side is built once per
    * deployment, not once per micro-batch. */
  def scoreBatch(events: DataFrame, fitted: RecommenderModel.Fitted,
                 collect: DataFrame, latestK: Int = 3,
                 filterCollected: Boolean = true,
                 params: Recommender.Params = Recommender.Params(),
                 corpusPostings: Option[DataFrame] = None): Recommender.Recs = {
    // restrict the collect snapshot to this batch's users FIRST — the
    // snapshot is large and static, the batch is small; without the
    // semi-join every micro-batch pays a full-table window + groupBy
    val batchCollect = collect
      .join(events.select(col("userId")), Seq("userId"), "left_semi")
    val latest = Collections.latestBooks(batchCollect, latestK)
    // payload bookIds win; otherwise the user's latest collected books
    val queryBooks = events
      .join(latest, events("userId") === latest("userId"), "left")
      .select(events("userId"),
        coalesce(events("bookIds"), latest("books")).as("books"))
      .where(col("books").isNotNull && size(col("books")) > 0)
    val queryDocs = Collections.userDocs(queryBooks, fitted.bookDocs)
    val queries = RecommenderModel.assignQueries(fitted, queryDocs)
    val collected = batchCollect.where(col("isCollect") === 1)
      .groupBy("userId").agg(collect_set(col("bookId")).as("books"))
    val recs = Recommender.recommend(fitted, queries, collected,
      params, filterOwn = filterCollected, corpusPostings = corpusPostings)
    // ST6: every decoded event user gets an answer — users with no query
    // context (no collections, no payload books) fall back to the hot list
    // and the default similar-user ids (the reference's evident intent on
    // scoring failure, guessLike_u_like.py:174-175,207-209; its own
    // fallback code is buggy, SURVEY §4.2).
    val books = graft.rank.Blend.withFallback(
      recs.books, events.select(col("userId")), fitted.hot, params.recCap)
    val users = graft.rank.Blend.withUserFallback(
      recs.users, events.select(col("userId")), params.defaultUsers)
    Recommender.Recs(books, users)
  }

  /** Wire a raw frame stream (value: String) through decode → score →
    * KV write. Returns the started query.
    *
    * `trigger` defaults to AvailableNow (drain-and-stop — the test and
    * backfill mode); a live deployment passes
    * `Trigger.ProcessingTime(...)` (or Continuous is unsupported here) to
    * keep the reference's always-on consumer semantics.
    *
    * `checkpointLocation` is the restart story the reference lacks
    * (its services refit and resubscribe from scratch on crash,
    * recommender-online/README.md:3-8): point it at durable storage and a
    * resubmitted job resumes from the last committed micro-batch for any
    * replayable source (file/Kafka-class). KV writes are at-least-once
    * across restarts — idempotent, since every write is a full-value SET
    * per user key. */
  def start(frames: DataFrame, fitted: RecommenderModel.Fitted,
            collect: DataFrame, kv: KVSink,
            filterCollected: Boolean = true,
            params: Recommender.Params = Recommender.Params(),
            trigger: Trigger = Trigger.AvailableNow(),
            checkpointLocation: Option[String] = None): StreamingQuery = {
    val decoded = EventSource.decode(frames)
    // Build the SERVING INDEX once per deployment: the corpus side of the
    // similarity join (term postings + norms over the model users) is
    // batch-invariant, and recomputing it per micro-batch makes batch
    // latency scale with corpus size instead of batch size. This is the
    // engine form of the reference's per-cluster similarity index (its
    // 66 s build stage, simility_compute.py via BASELINE.md) — held for
    // the stream's lifetime, released when the deployment's session ends.
    // At 100 TB the same frame is a materialized table bucketed by
    // (cluster, term); MEMORY_AND_DISK is its local-mode stand-in.
    val postings = graft.rank.Scoring
      .termPostings(fitted.userTokens, Some(fitted.cv.vocabulary.toSet))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    postings.count() // eager: the index must not rebuild lazily mid-batch
    val base = decoded.writeStream
      .outputMode("append")
    checkpointLocation.foreach(base.option("checkpointLocation", _))
    val query = base
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val recs = scoreBatch(batch, fitted, collect,
            filterCollected = filterCollected, params = params,
            corpusPostings = Some(postings))
          // ONE write action for both key families: the books and users
          // plans share the whole similarity subtree (queries → sims), and
          // two separate actions would execute it twice per batch — cross-
          // action plans cannot reuse exchanges. Unioned into a single
          // plan, the shared shuffles dedup via ReusedExchange.
          KVWriter.write(
            recs.books.select(
              TextFunctions.kvKey("b_like", col("query")).as("key"),
              TextFunctions.joinIds(col("books")).as("value"))
            .unionAll(recs.users.select(
              TextFunctions.kvKey("u_similar", col("query")).as("key"),
              TextFunctions.joinIds(col("users")).as("value"))), kv)
        }
        ()
      }
      .trigger(trigger)
      .start()
    withIndexCleanup(query, postings)
  }

  /** [[start]] with index-lifecycle hygiene: the serving index persist is
    * released when THIS query terminates (a resubmitted deployment builds
    * its own), so repeated deploy/stop cycles — restart tests, model
    * refreshes — do not accumulate stream-lifetime caches. */
  private def withIndexCleanup(q: StreamingQuery,
                               postings: DataFrame): StreamingQuery = {
    val spark = postings.sparkSession
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == q.id) {
            postings.unpersist()
            spark.streams.removeListener(this)
          }
      })
    q
  }
}
