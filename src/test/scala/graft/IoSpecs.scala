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
}
