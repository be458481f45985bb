package graft.io

import org.apache.spark.sql.DataFrame
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Pluggable key-value sink (SURVEY §2.1 K1/K2).
  *
  * The reference writes comma-joined id lists to Redis string keys
  * (`SET b_similar:{i}` simility_books.py:93-94; `SET b_like:{uid}` with a
  * sleep-30s-reconnect-retry path, guessLike_u_like.py:211-226). The engine
  * abstracts the store behind a trait so tests run on an in-memory map and
  * production plugs a real client; writes happen per partition on the
  * executors (`foreachPartition`), never on the driver.
  */
trait KVSink extends Serializable {
  def put(key: String, value: String): Unit
  def get(key: String): Option[String]
}

/** In-memory KV for tests — a JVM-global concurrent map so executor threads
  * (local mode) and the driver observe the same store. */
class InMemoryKV extends KVSink {
  def put(key: String, value: String): Unit = InMemoryKV.store.put(key, value)
  def get(key: String): Option[String] = Option(InMemoryKV.store.get(key))
}
object InMemoryKV {
  private val store = new ConcurrentHashMap[String, String]()
  def snapshot: Map[String, String] = store.asScala.toMap
  def clear(): Unit = store.clear()
}

/** Bounded-retry wrapper — the engine form of the reference's
  * sleep-and-reconnect loop (guessLike_u_like.py:214-226, one retry after
  * 30 s). Retries are per-operation with backoff, bounded, then rethrow. */
class RetryingKV(inner: KVSink, maxRetries: Int = 1, backoffMs: Long = 100L)
    extends KVSink {
  private def withRetry[T](op: => T): T = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: Exception if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }
  def put(key: String, value: String): Unit = withRetry(inner.put(key, value))
  def get(key: String): Option[String] = withRetry(inner.get(key))
}

object JdbcUpsert {
  import org.apache.spark.sql.functions.col

  /** K5: the reference's `INSERT IGNORE` (scraper notebook cell-4) —
    * append only rows whose keys are absent from the existing table,
    * expressed as a left-anti join before the write (SURVEY §2.1 K5). */
  def insertIgnore(incoming: DataFrame, existing: DataFrame,
                   keys: Seq[String]): DataFrame =
    incoming.dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*), keys, "left_anti")
}

object KVWriter {
  /** Writes a (key, value) DataFrame to the sink from the executors.
    * The DataFrame must have exactly two string columns. */
  def write(df: DataFrame, sink: KVSink): Unit =
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.foreach(r => sink.put(r.getString(0), r.getString(1)))
    }
}
