package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.functions._
import graft.io.KVSink
import graft.jobs.{RecommenderModel, ServeJob}

/** The replayable-source recipe (SURVEY §3.2 / VERDICT r2 #6): the RESP
  * pub/sub source is at-most-once across restarts (inherent to pub/sub —
  * events published while the consumer is down are gone). The upgrade path
  * for a production event stream is any REPLAYABLE source (file drop-dir
  * here; a Kafka-class log identically) + `checkpointLocation`: offsets
  * commit per micro-batch, so a resubmitted job resumes exactly after the
  * last committed batch — at-least-once end-to-end, and the KV writes are
  * full-value SETs per user key, hence idempotent under replay.
  *
  * ServeJob takes any streaming DataFrame with a `value: String` column, so
  * swapping pub/sub → replayable is ONLY a change of `readStream` call —
  * this spec runs the real serving pipeline (decode → score → KV) from a
  * file source, kills it, appends events, restarts from the same
  * checkpoint, and proves the first batch is not reprocessed. */
class ServeReplaySpec extends SparkSuite {

  test("file source + checkpoint: restart resumes after the committed batch") {
    val events = Files.createTempDirectory("graft-events").toFile
    val ckpt = Files.createTempDirectory("graft-ckpt").toFile
    val kv = new CountingKV
    val fitted = RecommenderModel.fit(
      Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
      Fixtures.collects(spark),
      minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)

    // one serving "deployment": drain whatever is in the drop-dir, stop —
    // AvailableNow stands in for a long-running ProcessingTime trigger so
    // the restart boundary is deterministic in a test
    def deploy(): Unit = {
      val frames = spark.readStream.text(events.getAbsolutePath)
      val q = ServeJob.start(frames, fitted, Fixtures.collects(spark), kv,
        checkpointLocation = Some(ckpt.getAbsolutePath))
      q.awaitTermination()
    }

    Files.write(new java.io.File(events, "batch1.json").toPath,
      """{"userId": 101}""".getBytes)
    deploy()
    assert(CountingKV.store.containsKey("b_like:101"))
    assert(CountingKV.counts.get("b_like:101") == 1)

    // job is down; a new event lands in the meantime — a pub/sub consumer
    // would lose it, the replayable log retains it
    Files.write(new java.io.File(events, "batch2.json").toPath,
      """{"userId": 106, "bookIds": [6]}""".getBytes)
    deploy()
    assert(CountingKV.store.containsKey("b_like:106"),
      "event published while down must be served after restart")
    assert(CountingKV.counts.get("b_like:101") == 1,
      "restart must resume AFTER the committed batch, not replay it")
  }
}

/** KV that counts per-key puts — reprocessing a batch after restart
  * would bump a key's count past its first-run value. JVM-global state so
  * executor threads (local mode) and the driver observe the same store. */
class CountingKV extends KVSink with Serializable {
  def put(key: String, value: String): Unit = {
    CountingKV.counts.merge(key, Integer.valueOf(1),
      (a: Integer, b: Integer) => Integer.valueOf(a + b))
    CountingKV.store.put(key, value)
  }
  def get(key: String): Option[String] = Option(CountingKV.store.get(key))
}
object CountingKV {
  val counts = new ConcurrentHashMap[String, Integer]()
  val store = new ConcurrentHashMap[String, String]()
}
