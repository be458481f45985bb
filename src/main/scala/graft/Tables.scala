package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read the tables they
  * need; projection/filter pushdown into the parquet scan is left to Catalyst
  * (the scan should show `PushedFilters`/`ReadSchema` pruning in `.explain`).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events` with `ts` normalized to LONG NANOSECONDS since the epoch,
    * whatever the on-disk physical type. The testdata generator has shipped
    * `ts` both as parquet TIMESTAMP(NANOS) (read as long via the session's
    * `nanosAsLong` flag) and as timestamp[us] (read as TIMESTAMP/
    * TIMESTAMP_NTZ) across rounds; every downstream query assumes integer
    * nanoseconds (`ts DIV 1000` → µs). NTZ wall-clock is interpreted as UTC
    * — sessions pin `spark.sql.session.timeZone=UTC` — matching DuckDB's
    * naive-timestamp reading of the same file, so oracle SQL written against
    * `epoch_us(ts)` agrees bit-for-bit. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw
      case TimestampType    =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        raw.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
