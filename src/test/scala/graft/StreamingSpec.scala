package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming semantics beyond the serve job (SURVEY §2.8 ST5's
  * streaming variant): event-time tumbling windows with a watermark, and
  * late-data expiry — the streaming upgrade of the reference's daily-batch
  * "window". */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("stateful: flatMapGroupsWithState dedups events per key across batches") {
    import graft.streaming.Stateful
    import graft.streaming.Stateful.KeyedEvent
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KeyedEvent]
    val q = Stateful.dedupedEvents(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    stream.addData(KeyedEvent(1L, 10L), KeyedEvent(1L, 10L), KeyedEvent(1L, 11L))
    q.processAllAvailable()
    stream.addData(KeyedEvent(1L, 10L), KeyedEvent(2L, 10L))  // 10 dup for k1, new for k2
    q.processAllAvailable()
    val got = spark.table("dedup_out").as[KeyedEvent].collect().toSet
    q.stop()
    assert(got == Set(KeyedEvent(1L, 10L), KeyedEvent(1L, 11L), KeyedEvent(2L, 10L)))
  }

  test("stateful: running counts accumulate across batches") {
    import graft.streaming.Stateful
    import graft.streaming.Stateful.{CountUpdate, KeyedEvent}
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KeyedEvent]
    val q = Stateful.runningCounts(stream.toDS(), timeoutMs = 0L)
      .writeStream.outputMode("append")
      .format("memory").queryName("counts_out").start()
    stream.addData(KeyedEvent(5L, 1L), KeyedEvent(5L, 2L))
    q.processAllAvailable()
    stream.addData(KeyedEvent(5L, 3L))
    q.processAllAvailable()
    val got = spark.table("counts_out").as[CountUpdate].collect().toSet
    q.stop()
    assert(got.contains(CountUpdate(5L, 2L)) && got.contains(CountUpdate(5L, 3L)))
  }

  test("ST5: watermarked tumbling-window counts over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val windowed = stream.toDF().toDF("ts", "kind")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("kind"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "HH:mm").as("h"), col("kind"), col("n"))
    val q = windowed.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    stream.addData(
      (Timestamp.valueOf("2017-03-03 10:05:00"), "view"),
      (Timestamp.valueOf("2017-03-03 10:55:00"), "view"),
      (Timestamp.valueOf("2017-03-03 11:05:00"), "click"))
    q.processAllAvailable()
    val got = spark.table("win_out").as[(String, String, Long)].collect().toSet
    q.stop()
    assert(got == Set(("10:00", "view", 2L), ("11:00", "click", 1L)))
  }

  test("watermark dedup: duplicates dropped across batches, state bounded by event time") {
    import graft.streaming.WatermarkDedup
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val deduped = WatermarkDedup.dedup(
      stream.toDF().toDF("ts", "event_id"), Seq("event_id"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup_out").start()
    // batch 1: event 1 twice (same batch), event 2 once
    stream.addData(
      (Timestamp.valueOf("2017-03-03 10:00:00"), 1L),
      (Timestamp.valueOf("2017-03-03 10:00:30"), 1L),
      (Timestamp.valueOf("2017-03-03 10:01:00"), 2L))
    q.processAllAvailable()
    // batch 2: event 1 AGAIN within the watermark → dropped; event 3 new
    stream.addData(
      (Timestamp.valueOf("2017-03-03 10:02:00"), 1L),
      (Timestamp.valueOf("2017-03-03 10:03:00"), 3L))
    q.processAllAvailable()
    val got = spark.table("wm_dedup_out").select("event_id")
      .as[Long].collect().toSeq.sorted
    q.stop()
    assert(got == Seq(1L, 2L, 3L), s"got $got")
  }

  test("ST8 streaming: native session_window matches the batch gap semantics") {
    // the streaming-native form of Sessionize (st8): Spark's session_window
    // merges events within a 30-minute gap incrementally under a watermark
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val sessions = stream.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), date_format(col("session_window.start"), "HH:mm").as("s"),
        col("n"))
    val q = sessions.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    stream.addData(
      (Timestamp.valueOf("2017-03-03 10:00:00"), 1L),   // session A...
      (Timestamp.valueOf("2017-03-03 10:20:00"), 1L),   // ...extends A to 10:50
      (Timestamp.valueOf("2017-03-03 11:30:00"), 1L),   // gap > 30min: session B
      (Timestamp.valueOf("2017-03-03 10:05:00"), 2L))
    q.processAllAvailable()
    val got = spark.table("sess_out").as[(Long, String, Long)].collect().toSet
    q.stop()
    assert(got == Set((1L, "10:00", 2L), (1L, "11:30", 1L), (2L, "10:05", 1L)))
  }
}
