package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.StreamJoin

/** Stream-stream interval join: pairs inside the time bound survive, pairs
  * outside it don't, and the join works across micro-batch boundaries
  * (state buffers the earlier side until the match arrives). */
class StreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("clicks join impressions within [-0s, +10s]; outside-window pairs drop") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, String)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("user", "imp_ts", "imp_id"),
      clicks.toDF().toDF("user", "click_ts", "click_id"),
      key = "user", leftTs = "imp_ts", rightTs = "click_ts",
      watermark = "5 seconds", before = "0 seconds", after = "10 seconds")
    val q = joined.select("user", "imp_id", "click_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("sj_out").start()

    // batch 1: impressions only — nothing joins yet, state must buffer
    imps.addData((1L, ts(100), "i1"), (2L, ts(100), "i2"))
    q.processAllAvailable()
    assert(spark.table("sj_out").count() == 0)

    // batch 2: one click inside the window, one too late, one wrong user
    clicks.addData((1L, ts(105), "c1"))    // 5s after i1 → joins
    clicks.addData((2L, ts(115), "c2"))    // 15s after i2 → outside window
    clicks.addData((3L, ts(101), "c3"))    // no impression for user 3
    q.processAllAvailable()
    val got = spark.table("sj_out").as[(Long, String, String)].collect().toSet
    q.stop()
    assert(got == Set((1L, "i1", "c1")))
  }

  test("left outer: unclicked impressions surface with nulls after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, String)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamJoin.intervalJoinLeftOuter(
      imps.toDF().toDF("user", "imp_ts", "imp_id"),
      clicks.toDF().toDF("user", "click_ts", "click_id"),
      key = "user", leftTs = "imp_ts", rightTs = "click_ts",
      watermark = "5 seconds", before = "0 seconds", after = "10 seconds")
    val q = joined.select("user", "imp_id", "click_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("sjo_out").start()

    imps.addData((1L, ts(100), "i1"), (2L, ts(100), "i2"))
    clicks.addData((1L, ts(104), "c1"))   // user 1 clicks; user 2 never does
    q.processAllAvailable()
    // push BOTH watermarks far past i2's window end (110 + 5s lateness):
    // only then is "no click yet" provably "no click ever"
    imps.addData((9L, ts(400), "i9"))
    clicks.addData((9L, ts(401), "c9"))
    q.processAllAvailable()
    val got = spark.table("sjo_out")
      .select("user", "imp_id", "click_id")
      .as[(Long, String, Option[String])].collect().toSet
    q.stop()
    assert(got.contains((1L, "i1", Some("c1"))))
    assert(got.contains((2L, "i2", None)),
      s"unclicked impression must surface as a negative example, got $got")
  }

  test("full outer: unmatched rows from BOTH sides surface, key never null") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, String)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamJoin.intervalJoinFullOuter(
      imps.toDF().toDF("user", "imp_ts", "imp_id"),
      clicks.toDF().toDF("user", "click_ts", "click_id"),
      key = "user", leftTs = "imp_ts", rightTs = "click_ts",
      watermark = "5 seconds", before = "0 seconds", after = "10 seconds")
    val q = joined.select("user", "imp_id", "click_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("sjf_out").start()

    imps.addData((1L, ts(100), "i1"), (2L, ts(100), "i2"))
    clicks.addData((1L, ts(104), "c1"))   // matches i1
    clicks.addData((3L, ts(100), "c3"))   // orphan click, no impression
    q.processAllAvailable()
    // advance both watermarks far past every open window
    imps.addData((9L, ts(400), "i9"))
    clicks.addData((9L, ts(401), "c9"))
    q.processAllAvailable()
    val got = spark.table("sjf_out")
      .as[(Long, Option[String], Option[String])].collect().toSet
    q.stop()
    assert(got.contains((1L, Some("i1"), Some("c1"))))
    assert(got.contains((2L, Some("i2"), None)),
      s"unclicked impression must surface: $got")
    assert(got.contains((3L, None, Some("c3"))),
      s"orphan click must surface WITH its key: $got")
  }

  test("the same operator runs in batch mode for backtests") {
    val imps = Seq((1L, ts(100), "i1"), (2L, ts(200), "i2"))
      .toDF("user", "imp_ts", "imp_id")
    val clicks = Seq((1L, ts(103), "c1"), (2L, ts(300), "c2"))
      .toDF("user", "click_ts", "click_id")
    val got = StreamJoin.intervalJoin(imps, clicks, "user",
        "imp_ts", "click_ts", "5 seconds", "0 seconds", "10 seconds")
      .select("imp_id", "click_id").as[(String, String)].collect().toSet
    assert(got == Set(("i1", "c1")))
  }
}

/** Rate-limited backfill: `maxFilesPerTrigger` + AvailableNow drains an
  * arbitrarily large file backlog in bounded micro-batches (each one a
  * checkpointed unit of progress) instead of one giant batch — the pattern
  * that lets a 100 TB backlog replay with bounded executor memory and
  * restartable progress. */
class BackfillSpec extends SparkSuite {
  import spark.implicits._

  test("maxFilesPerTrigger chunks the backlog; every row arrives exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-backfill").toFile
    (1 to 6).foreach { i =>
      java.nio.file.Files.write(new java.io.File(dir, s"f$i.txt").toPath,
        (1 to 10).map(j => s"${i}_$j").mkString("\n").getBytes)
    }
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .option("maxFilesPerTrigger", 2)   // the rate limit
      .text(dir.getAbsolutePath)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()): Unit
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq
    assert(sizes.sum == 60L, s"every row exactly once, got $sizes")
    assert(sizes.size >= 3, s"6 files at 2/trigger must take >= 3 batches, got $sizes")
    assert(sizes.forall(_ <= 20L), s"no batch may exceed the rate limit, got $sizes")
  }
}
