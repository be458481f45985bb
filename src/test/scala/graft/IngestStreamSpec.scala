package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Streaming training-data ingest E2E — the round-6 kernels composed on
  * the STREAMING path: a JSONL crawl feed ingested incrementally with
  * HTML extraction (HtmlText), a quality floor, and content-fingerprint
  * dedup whose state is watermark-bounded
  * (`dropDuplicatesWithinWatermark`) and survives a RESTART through the
  * checkpoint — the exactly-once corpus-append shape a continuous crawl
  * pipeline runs. File source + AvailableNow so each test run drains
  * exactly the files present (the BackfillSpec idiom). */
class IngestStreamSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("page_id", LongType),
    StructField("ts", TimestampType),
    StructField("html", StringType)))

  private def page(id: Long, sec: Int, body: String): String =
    s"""{"page_id": $id, "ts": "2024-05-01T10:00:${f"$sec%02d"}Z", """ +
      s""""html": "<html><body><p>$body</p><script>x()</script></body></html>"}"""

  test("streaming ingest: extract + quality floor + watermark dedup, " +
    "exactly-once across a checkpointed restart") {
    val root = Files.createTempDirectory("graft-ingest").toString
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    Files.createDirectories(Paths.get(in))

    def pipeline() = {
      val raw = spark.readStream.schema(schema).json(in)
      raw.select(col("page_id"), col("ts"),
          graft.functions.TextFunctions.htmlText(col("html")).as("text"))
        .where(size(graft.functions.TextFunctions.tokenize(col("text"))) >= 3)
        .withColumn("fp", xxhash64(col("text")))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("fp")
    }
    def drain(): Unit = {
      val q = pipeline().writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).format("parquet").start(out)
      q.awaitTermination()
    }

    // batch 1: two keepers, an in-batch content duplicate (different id,
    // same extracted text), and a junk page below the quality floor
    Files.writeString(Paths.get(s"$in/b1.jsonl"), Seq(
      page(1, 1, "the quick brown fox"),
      page(2, 2, "an entirely different document"),
      page(3, 3, "the quick brown fox"),   // dup of 1 after extraction
      page(4, 4, "short")                  // fails the 3-token floor
    ).mkString("\n"))
    drain()
    val r1 = spark.read.parquet(out)
    assert(r1.count() == 2)
    assert(r1.select("text").as[String].collect().toSet ==
      Set("the quick brown fox", "an entirely different document"))

    // batch 2 after a RESTART from the same checkpoint: a cross-restart
    // duplicate (same content as page 1, within the watermark) must be
    // dropped by the restored state; the new page appends exactly once
    Files.writeString(Paths.get(s"$in/b2.jsonl"), Seq(
      page(5, 10, "the quick brown fox"),  // dup of batch-1 content
      page(6, 11, "a genuinely new page arrives")
    ).mkString("\n"))
    drain()
    val r2 = spark.read.parquet(out)
    assert(r2.count() == 3)
    assert(r2.where(col("text") === "the quick brown fox").count() == 1)
    assert(r2.where(col("page_id") === 6).count() == 1)

    // idempotent re-drain with no new files: nothing appends
    drain()
    assert(spark.read.parquet(out).count() == 3)
  }
}
