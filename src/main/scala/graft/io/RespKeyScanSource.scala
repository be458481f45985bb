package graft.io

import java.util.{Map => JMap}

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Batch DataSourceV2 read of a RESP key/value store — the missing third
  * leg of the connector family (K1 write, K3 pub/sub stream, this: bulk
  * read-back). The reference reads its serving KV only key-at-a-time
  * inside the event loop (guessLike_u_like.py:196-200); auditing or
  * backfilling FROM the store needs the set-oriented form:
  *
  * {{{
  * spark.read.format("graft.io.RespKeyScanProvider")
  *   .option("host", h).option("port", p)
  *   .option("pattern", "b_like:*")        // server-side key filter
  *   .option("numPartitions", "8")
  *   .load()                               // schema: key STRING, value STRING
  * }}}
  *
  * Planning: the driver enumerates matching keys with cursor-paged SCAN
  * (never the blocking KEYS) and round-robins them into `numPartitions`
  * input partitions; each executor reader GETs its slice over its own
  * pooled connection. Key enumeration is driver-side because a single
  * RESP endpoint has no server-side split to offer — with a clustered
  * store, partition by hash slot instead and this plan becomes one SCAN
  * per slot range. Semantics are a non-atomic snapshot (standard for
  * SCAN): keys deleted between planning and read surface with a null
  * value; keys created after planning are absent.
  */
class RespKeyScanProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RespKeyScanProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new RespKeyScanTable(
      properties.get("host"),
      Integer.parseInt(properties.get("port")),
      Option(properties.get("pattern")).getOrElse("*"),
      Option(properties.get("numPartitions")).map(Integer.parseInt(_))
        .getOrElse(4))
}

object RespKeyScanProvider {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** Cursor-paged SCAN of every key matching `pattern`. */
  private[io] def scanKeys(client: RespClient, pattern: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cursor = "0"
    var first = true
    while (first || cursor != "0") {
      first = false
      client.command("SCAN", cursor, "MATCH", pattern, "COUNT", "512") match {
        case Resp.Arr(Seq(cur, Resp.Arr(keys))) =>
          cursor = cur match {
            case Resp.Bulk(Some(c)) => c
            case Resp.Simple(c)     => c
            case other => throw new java.io.IOException(s"bad SCAN cursor: $other")
          }
          out ++= keys.collect { case Resp.Bulk(Some(k)) => k }
        case other => throw new java.io.IOException(s"bad SCAN reply: $other")
      }
    }
    out.toSeq
  }
}

private[io] class RespKeyScanTable(host: String, port: Int, pattern: String,
                                   numPartitions: Int)
    extends Table with SupportsRead {
  require(numPartitions >= 1, s"numPartitions must be >= 1 (got $numPartitions)")
  override def name(): String = s"resp-keyscan($host:$port/$pattern)"
  override def schema(): StructType = RespKeyScanProvider.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RespKeyScanProvider.schema
        override def toBatch: Batch = new RespKeyScanBatch(host, port,
          pattern, numPartitions)
      }
    }
}

private[graft] case class KeysPartition(keys: Array[String]) extends InputPartition

private[io] class RespKeyScanBatch(host: String, port: Int, pattern: String,
                                   numPartitions: Int) extends Batch {

  override def planInputPartitions(): Array[InputPartition] = {
    val client = RespClient.pooled(host, port)
    val keys =
      try RespKeyScanProvider.scanKeys(client, pattern)
      catch { case e: java.io.IOException =>
        RespClient.invalidate(host, port); throw e }
    // round-robin over SORTED keys: deterministic partition contents, and
    // lexicographically adjacent (same-prefix) keys spread across readers
    // instead of hot-spotting one
    val slices = Array.fill(numPartitions)(
      scala.collection.mutable.ArrayBuffer.empty[String])
    keys.sorted.zipWithIndex.foreach { case (k, i) =>
      slices(i % numPartitions) += k
    }
    slices.filter(_.nonEmpty).map(s => KeysPartition(s.toArray): InputPartition)
  }

  // a standalone case class: the factory ships to executors, so it must
  // close over nothing but its own serializable fields
  override def createReaderFactory(): PartitionReaderFactory =
    RespKeyScanReaderFactory(host, port)
}

private[graft] case class RespKeyScanReaderFactory(host: String, port: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val keys = p.asInstanceOf[KeysPartition].keys
    new PartitionReader[InternalRow] {
      private val kv = new RespKV(host, port)   // pooled under the hood
      private var i = -1
      private var row: InternalRow = _
      override def next(): Boolean = {
        i += 1
        if (i >= keys.length) return false
        val v = kv.get(keys(i))
        row = new GenericInternalRow(Array[Any](
          UTF8String.fromString(keys(i)),
          v.map(UTF8String.fromString).orNull))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
