package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.io.InMemoryKV
import graft.jobs.{Recommender, RecommenderModel, ServeJob}

/** Hot model refresh (round-10 item: the ST4 extension). A long-lived
  * serving deployment refits offline and swaps the fitted model + serving
  * index into the RUNNING stream between micro-batches — no restart, no
  * misaligned batch (every event scores against exactly one coherent
  * (model, index) generation), no dropped events across the boundary. */
class HotSwapSpec extends SparkSuite {
  import spark.implicits._

  private def fit(collects: org.apache.spark.sql.DataFrame) =
    RecommenderModel.fit(
      Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
      collects, minCollected = 2, minDf = 1.0, stopWords = Nil,
      k = 2, hotN = 3)

  /** Generation-2 world: user 101's collections change completely (6,8
    * instead of 1,3,5,7), which changes their latest-k query context, the
    * collected-filter set, AND the global hot list. */
  private def collects2 = {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      (101L, 6L, 1, ts("2017-04-01 10:00:00")),
      (101L, 8L, 1, ts("2017-04-01 11:00:00")),
      (102L, 3L, 1, ts("2017-03-02 10:00:00")),
      (102L, 4L, 1, ts("2017-03-02 11:00:00")),
      (102L, 8L, 1, ts("2017-03-02 12:00:00")),
      (103L, 5L, 1, ts("2017-03-01 09:00:00")),
      (103L, 6L, 1, ts("2017-03-01 09:30:00")),
      (103L, 7L, 1, ts("2017-03-01 09:45:00")),
      (104L, 6L, 1, ts("2017-03-03 08:00:00")),
      (104L, 8L, 1, ts("2017-03-03 08:10:00")),
      (104L, 7L, 1, ts("2017-03-03 08:20:00"))
    ).toDF("userId", "bookId", "isCollect", "time")
  }

  /** The batch-lane oracle for what generation `fitted` should answer for
    * `userId` — computed OUTSIDE the stream, through the same scoreBatch. */
  private def expectedBooks(fitted: RecommenderModel.Fitted,
                            collect: org.apache.spark.sql.DataFrame,
                            userId: Long): String = {
    val ev = Seq((userId, null.asInstanceOf[Seq[Long]]))
      .toDF("userId", "bookIds")
    val recs = ServeJob.scoreBatch(ev, fitted, collect)
    recs.books.where(col("query") === userId)
      .select(graft.functions.TextFunctions.joinIds(col("books")))
      .head().getString(0)
  }

  private def runSwapTest(serveBudgetBytes: Long, laneName: String): Unit = {
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val coll1 = Fixtures.collects(spark)
    val coll2 = collects2
    val f1 = fit(coll1)
    val f2 = fit(coll2)
    val exp1 = expectedBooks(f1, coll1, 101L)
    val exp2 = expectedBooks(f2, coll2, 101L)
    assert(exp1 != exp2,
      "fixture must give generation-distinguishable answers for user 101")
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    // ProcessingTime keeps the query ALIVE between batches — the swap has
    // to land in a running stream, not across a restart
    val (q, handle) = ServeJob.startSwappable(stream.toDF(), f1, coll1, kv,
      trigger = Trigger.ProcessingTime(0L),
      serveBudgetBytes = serveBudgetBytes)
    try {
      assert(handle.generation == 1L)
      stream.addData("""{"userId": 101}""")
      q.processAllAvailable()
      assert(InMemoryKV.snapshot("b_like:101") == exp1,
        s"[$laneName] generation 1 must serve the generation-1 answer")

      // offline refit done → swap into the running stream
      handle.swap(f2, coll2)
      assert(handle.generation == 2L)

      InMemoryKV.clear()
      stream.addData("""{"userId": 101}""")
      q.processAllAvailable()
      assert(InMemoryKV.snapshot("b_like:101") == exp2,
        s"[$laneName] first post-swap batch must serve the new generation")

      // no dropped events across the boundary: a second user in the same
      // post-swap stream still gets an answer (fallback or scored)
      stream.addData("""{"userId": 777}""")
      q.processAllAvailable()
      assert(InMemoryKV.snapshot.contains("b_like:777"),
        s"[$laneName] events after the swap must all be answered")
    } finally q.stop()
    // swap into a terminated stream is refused loudly
    val e = intercept[IllegalArgumentException] { handle.swap(f1, coll1) }
    assert(e.getMessage.contains("terminated"))
  }

  test("hot swap on the fused broadcast lane: next batch serves the new generation") {
    runSwapTest(graft.rank.Scoring.DefaultServeBudgetBytes, "fused")
  }

  test("a generation build that fails partway releases its persisted assets") {
    // exchange lane (budget 1 refuses the broadcasts): termPostings is
    // persisted and counted, THEN localize(hot) throws its bounded-collect
    // require — before the Generation's release hook exists. The failed
    // deployment must clean up after itself, not pin the postings for the
    // session (the round-10 review finding).
    val coll = Fixtures.collects(spark)
    val f1 = fit(coll)
    val bigHot = f1.hot.crossJoin(spark.range(5000).select(lit(1).as("__x")))
      .select(f1.hot.columns.map(col): _*)
    assert(bigHot.count() > graft.rank.Blend.MaxHotCollect)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val e = intercept[IllegalArgumentException] {
      ServeJob.startSwappable(stream.toDF(), f1.copy(hot = bigHot), coll,
        new InMemoryKV, serveBudgetBytes = 1L)
    }
    assert(e.getMessage.contains("not deployment-bounded"))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.isEmpty,
      s"failed generation build leaked persisted RDDs: $leaked")
  }

  test("hot swap on the exchange lane: postings swap with the model") {
    // byte budget of 1 forces the guard to refuse the broadcast lane, so
    // the deployment serves through the distributed exchange lane and the
    // swap must replace the persisted postings index too
    runSwapTest(1L, "exchange")
  }

  test("a swapped-out generation is released one batch later, off-thread — and at termination when no batch follows (r11 verdict 2)") {
    // exchange lane (budget 1): each generation persists its postings
    // index, so release timing is observable via getPersistentRDDs.
    // Contract under test: after swap() returns, the OLD generation's
    // persist is still alive (release deferred — its destroy/unpersist
    // storm must not land under the first post-swap batch); after the
    // next batch completes it is released asynchronously; a swap never
    // followed by a batch is drained by the termination hook.
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val coll1 = Fixtures.collects(spark)
    val f1 = fit(coll1)
    val f2 = fit(collects2)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    def extraPersists: Int =
      (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val (q, handle) = ServeJob.startSwappable(stream.toDF(), f1, coll1, kv,
      trigger = Trigger.ProcessingTime(0L), serveBudgetBytes = 1L)
    try {
      stream.addData("""{"userId": 101}""")
      q.processAllAvailable()
      assert(extraPersists == 1, s"one live postings persist expected")
      handle.swap(f2, collects2)
      assert(extraPersists == 2,
        "old generation must still be retained right after the swap — " +
          "its release is deferred past the next batch")
      stream.addData("""{"userId": 101}""")
      q.processAllAvailable()
      // released AFTER that batch completed, on a daemon thread — poll
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (extraPersists > 1 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(extraPersists == 1,
        "old generation must be released once the first post-swap batch " +
          "completes")
      // second swap with NO batch afterwards: the termination hook must
      // drain the parked generation
      handle.swap(f1, coll1)
      assert(extraPersists == 2)
    } finally q.stop()
    val deadline2 = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (extraPersists > 0 && System.nanoTime() < deadline2)
      Thread.sleep(50)
    assert(extraPersists == 0,
      "termination must release the live AND any parked generation")
  }

  test("an idle stream releases the parked generation after the grace period — no double model footprint until the next event (r12 advice)") {
    // the deferred release normally drains at the NEXT batch end; on an
    // idle/trickle stream that batch may be hours away, and the retired
    // generation's persists/broadcasts would be held the whole time. The
    // time-based fallback releases it after parkedReleaseGraceMs with NO
    // further batch ever firing.
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val coll1 = Fixtures.collects(spark)
    val f1 = fit(coll1)
    val f2 = fit(collects2)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    def extraPersists: Int =
      (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val (q, handle) = ServeJob.startSwappable(stream.toDF(), f1, coll1, kv,
      trigger = Trigger.ProcessingTime(0L), serveBudgetBytes = 1L,
      parkedReleaseGraceMs = 400L)
    try {
      stream.addData("""{"userId": 101}""")
      q.processAllAvailable()
      assert(extraPersists == 1)
      handle.swap(f2, collects2)
      assert(extraPersists == 2,
        "old generation parked right after the swap")
      // NO further batch: the grace timer alone must drain the park
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (extraPersists > 1 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(extraPersists == 1,
        "idle stream must release the parked generation after the grace " +
          "period without waiting for a batch")
      // the stream still serves correctly on the new generation
      stream.addData("""{"userId": 101}""")
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"post-grace batch failed: ${q.exception}")
    } finally q.stop()
  }

  test("swap is not starved by back-to-back batches (fair gate, r10 advice)") {
    // a feeder thread keeps the stream CONTINUOUSLY busy — with a non-fair
    // gate the foreachBatch thread can barge and reacquire at every batch
    // boundary, starving the swap indefinitely; the fair lock must grant
    // the swap the next boundary, so it completes well within the timeout
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val coll1 = Fixtures.collects(spark)
    val f1 = fit(coll1)
    val f2 = fit(collects2)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val (q, handle) = ServeJob.startSwappable(stream.toDF(), f1, coll1, kv,
      trigger = Trigger.ProcessingTime(0L))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val feeder = new Thread(() => {
      // throttled: MemoryStream retains every added batch in driver
      // memory, so an unthrottled loop would OOM the suite if a fairness
      // regression ever makes the swap block for the full 60 s — 1 ms
      // of backoff still keeps a batch queued at every gate boundary
      while (!stop.get()) { stream.addData("""{"userId": 101}"""); Thread.sleep(1) }
    }, "hotswap-feeder")
    feeder.setDaemon(true)
    try {
      stream.addData("""{"userId": 101}""")
      q.processAllAvailable()
      feeder.start()
      // ProcessingTime(0) + a nonstop feeder = zero idle gate time except
      // the inter-batch boundary itself; the swap's own build work is
      // done BEFORE it contends for the gate
      val t0 = System.nanoTime()
      handle.swap(f2, collects2)
      val waited = (System.nanoTime() - t0) / 1e9
      assert(handle.generation == 2L)
      assert(waited < 60.0,
        f"swap took $waited%.1f s under a continuously busy stream — " +
          "gate starvation")
    } finally {
      stop.set(true)
      feeder.join(10000)
      q.stop()
    }
  }
}
