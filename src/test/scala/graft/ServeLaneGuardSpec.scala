package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.io.InMemoryKV
import graft.jobs.{Recommender, RecommenderModel, ServeJob}
import graft.rank.Scoring

/** The fused serving lane's broadcasts are user-base/catalog-proportional,
  * so [[Scoring.buildServeAssetsGuarded]] must refuse them above a byte
  * budget and the deployment must fall back to the distributed exchange
  * lane — with IDENTICAL served results (the two lanes are numerically
  * equal; FusedScoringSpec pins the scoring, this pins the lane switch
  * end-to-end through the streaming job). Also pins the ServeIndex
  * latestK contract (ADVICE r8: scoreBatch used to silently ignore a
  * mismatched latestK on the serve lane). */
class ServeLaneGuardSpec extends SparkSuite {
  import spark.implicits._

  private def fit() = RecommenderModel.fit(
    Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
    Fixtures.collects(spark),
    minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)

  test("guard: under budget builds the index, over budget refuses") {
    val fitted = fit()
    val collect = Fixtures.collects(spark)
    val est = Scoring.estimateServeAssetBytes(fitted, collect)
    assert(est > 0L, "estimate must be positive for a non-empty model")
    assert(Scoring.buildServeAssetsGuarded(fitted, collect).isDefined,
      s"fixture model (est $est B) must fit the default budget")
    assert(Scoring.buildServeAssetsGuarded(fitted, collect, maxBytes = 1L).isEmpty,
      "a 1-byte budget must refuse the fused lane")
  }

  test("estimate scales with latestK — an OOM guard must not cap its own upper bound") {
    val fitted = fit()
    // 5 users x 100 collect rows each: enough snapshot depth that the
    // per-user latest list actually holds latestK ids at latestK = 64
    val wide = (0 until 500).map { i =>
      (101L + i % 5, 1L + i / 5, 1, f"2024-01-${1 + i % 28}%02d")
    }.toDF("userId", "bookId", "isCollect", "time")
    // BOTH points sit above the old min(latestK, 16) cap, so the capped
    // formula would make them equal — this fails against the exact bug
    val at32 = Scoring.estimateServeAssetBytes(fitted, wide, latestK = 32)
    val at64 = Scoring.estimateServeAssetBytes(fitted, wide, latestK = 64)
    assert(at64 > at32,
      s"estimate must grow with latestK (32 -> $at32 B, 64 -> $at64 B); " +
        "a capped term underestimates the broadcast the guard exists to refuse")
  }

  test("over-budget deployment serves through the exchange lane, " +
      "KV output identical to the fused lane") {
    val fitted = fit()
    val collect = Fixtures.collects(spark)
    implicit val sqlCtx = spark.sqlContext
    def serve(budget: Long): Map[String, String] = {
      InMemoryKV.clear()
      val kv = new InMemoryKV
      val stream = MemoryStream[String]
      stream.addData(Fixtures.eventFrames: _*)
      val q = ServeJob.start(stream.toDF(), fitted, collect, kv,
        serveBudgetBytes = budget)
      q.processAllAvailable()
      q.stop()
      val snap = InMemoryKV.snapshot
      InMemoryKV.clear()
      snap
    }
    val fused = serve(Scoring.DefaultServeBudgetBytes)
    val exchange = serve(1L) // force the guard to refuse the broadcasts
    assert(fused.nonEmpty && fused.keys.exists(_.startsWith("b_like:")))
    assert(exchange == fused,
      "exchange-lane fallback served different results than the fused lane")
  }

  test("lane parity holds on poison payloads: null bookIds elements and same-user duplicates") {
    val fitted = fit()
    val collect = Fixtures.collects(spark)
    implicit val sqlCtx = spark.sqlContext
    // one event with a null ELEMENT in bookIds (the exchange lane's
    // explode→inner-join drops it; the fused lane used to throw in the
    // encoder and crash-loop the stream), plus the SAME user twice in one
    // trigger (the exchange lane merges the user's event rows into one
    // query doc; the fused lane must concatenate identically)
    val frames = Seq(
      """{"userId": 101, "bookIds": [1, null, 2]}""",
      """{"userId": 102}""",
      """{"userId": 102, "bookIds": [3]}""")
    def serve(budget: Long): Map[String, String] = {
      InMemoryKV.clear()
      val kv = new InMemoryKV
      val stream = MemoryStream[String]
      stream.addData(frames: _*)
      val q = ServeJob.start(stream.toDF(), fitted, collect, kv,
        serveBudgetBytes = budget)
      q.processAllAvailable()
      q.stop()
      val snap = InMemoryKV.snapshot
      InMemoryKV.clear()
      snap
    }
    val fused = serve(Scoring.DefaultServeBudgetBytes)
    val exchange = serve(1L)
    assert(fused.keys.exists(_ == "b_like:101"),
      "the null-element payload must be served (null dropped), not crash the batch")
    assert(fused.keys.exists(_ == "b_like:102"))
    assert(exchange == fused,
      "poison/duplicate events must serve identical results on both lanes")
  }

  test("scoreBatch rejects a latestK that differs from the index's build depth") {
    val fitted = fit()
    val collect = Fixtures.collects(spark)
    val idx = Scoring.buildServeAssets(fitted, collect, latestK = 3)
    val batch = Seq((101L, Option.empty[Seq[Long]])).toDF("userId", "bookIds")
    val ex = intercept[IllegalArgumentException] {
      ServeJob.scoreBatch(batch, fitted, collect, latestK = 5,
        serve = Some(idx))
    }
    assert(ex.getMessage.contains("latestK"))
    idx.destroy()
  }
}
