package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY §7.1 io): every source gets a fixed explicit
  * schema (the reference inferred dtypes per query, §1.3 — the engine
  * treats cast failures as row filters instead).
  *
  * The engine's fixtures are parquet ([[graft.Tables]]); production tables
  * arrive over JDBC exactly as the reference's MySQL queries did
  * (simility_books.py:37,45), with Catalyst pushing projections and
  * filters into the database.
  */
object Sources {

  /** JDBC table scan (S1/S2): column pruning and filter pushdown reach the
    * database automatically; `partitionColumn` bounds enable parallel
    * reads (one executor per stride) — required for any table that won't
    * fit one connection's stream. */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                props: java.util.Properties,
                partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitionColumn match {
      case Some((colName, lower, upper, numParts)) =>
        spark.read.jdbc(url, table, colName, lower, upper, numParts, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }

  /** Schema'd CSV with drop-malformed semantics (S5/S6). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "DROPMALFORMED")
      .csv(path)

  /** Schema'd JSON-lines (K4 batch form). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)

  /** Raw media files as (path, modificationTime, length, content binary) —
    * the ingestion shape [[graft.operators.Multimodal.pack]] consumes. */
  def binaryFiles(spark: SparkSession, path: String,
                  glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
}
