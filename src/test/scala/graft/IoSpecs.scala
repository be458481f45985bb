package graft

import java.util.concurrent.atomic.AtomicInteger
import graft.io._

/** K2 retry semantics, K5 insert-ignore, S7 existence guard. */
class KVSinkSpec extends SparkSuite {
  import spark.implicits._

  test("K2: RetryingKV retries a transient failure then succeeds") {
    val failures = new AtomicInteger(2)
    val flaky = new KVSink {
      val inner = new InMemoryKV
      def put(k: String, v: String): Unit = {
        if (failures.getAndDecrement() > 0) throw new RuntimeException("transient")
        inner.put(k, v)
      }
      def get(k: String): Option[String] = inner.get(k)
    }
    InMemoryKV.clear()
    val kv = new RetryingKV(flaky, maxRetries = 3, backoffMs = 1L)
    kv.put("k", "v")
    assert(kv.get("k").contains("v"))
  }

  test("K2: RetryingKV rethrows after exhausting retries") {
    val always = new KVSink {
      def put(k: String, v: String): Unit = throw new RuntimeException("down")
      def get(k: String): Option[String] = None
    }
    val kv = new RetryingKV(always, maxRetries = 1, backoffMs = 1L)
    intercept[RuntimeException](kv.put("k", "v"))
  }

  test("K5: insertIgnore appends only new keys, deduping the incoming batch") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "b2"), (3L, "c"), (3L, "c-dup")).toDF("id", "v")
    val got = JdbcUpsert.insertIgnore(incoming, existing, Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("S7: log existence guard") {
    assert(!graft.prep.LogIngest.logExists(spark, "/nonexistent/2017/03/03/book.log"))
    val dir = java.nio.file.Files.createTempDirectory("s7")
    java.nio.file.Files.write(dir.resolve("book.log"), "1,x,x,x,x,2".getBytes)
    assert(graft.prep.LogIngest.logExists(spark, dir.toString + "/book.log"))
  }

  test("S9: schema'd CSV scan drops malformed rows, keeps typed good ones") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("s9")
    java.nio.file.Files.write(dir.resolve("ids.csv"),
      "1,9787020002207\n2,9787536692930\nnot-a-number,xyz\n3,9787544253994\n"
        .getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("isbn", StringType)))
    val got = Sources.csv(spark, dir.toString, schema)
    assert(got.schema == schema)
    // DROPMALFORMED: the unparseable id row vanishes instead of erroring
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("S9/K4: schema'd JSON-lines scan with drop-malformed semantics") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("s9json")
    java.nio.file.Files.write(dir.resolve("events.jsonl"),
      """{"userId": 101, "bookIds": [1, 2]}
        |garbage line
        |{"userId": 106}
        |""".stripMargin.getBytes("UTF-8"))
    val got = Sources.jsonLines(spark, dir.toString, io.EventSource.eventSchema)
    assert(got.where(org.apache.spark.sql.functions.col("userId").isNotNull)
      .select("userId").as[Long].collect().toSet == Set(101L, 106L))
  }

  test("quarantine ingestion: bad lines are captured verbatim, good rows typed") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("quarantine")
    java.nio.file.Files.write(dir.resolve("shipment.jsonl"),
      """{"userId": 101, "bookIds": [1, 2]}
        |{broken json!!
        |{"userId": 106}
        |not json at all
        |""".stripMargin.getBytes("UTF-8"))
    val q = Sources.jsonLinesQuarantine(spark, dir.toString,
      io.EventSource.eventSchema)
    assert(q.good.select("userId").as[Long].collect().toSet == Set(101L, 106L))
    assert(!q.good.columns.contains("_corrupt_record"))
    val bad = q.quarantine.select("raw").as[String].collect().toSet
    assert(bad == Set("{broken json!!", "not json at all"),
      s"quarantine must capture the raw lines verbatim, got $bad")
  }

  test("S10-adjacent: binaryFiles reads opaque content with metadata") {
    val dir = java.nio.file.Files.createTempDirectory("s10")
    java.nio.file.Files.write(dir.resolve("img.bin"),
      Array[Byte](1, 2, 3, 4, 5))
    java.nio.file.Files.write(dir.resolve("skip.txt"), "no".getBytes)
    val got = Sources.binaryFiles(spark, dir.toString, glob = "*.bin").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Array[Byte]]("content").toSeq == Seq[Byte](1, 2, 3, 4, 5))
    assert(got.head.getAs[Long]("length") == 5L)
  }
}
