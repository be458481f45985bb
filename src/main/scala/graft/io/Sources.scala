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

  /** A split ingestion result: rows that parsed (`good`, corrupt column
    * dropped) and the raw text of rows that did not (`quarantine`, one
    * `raw: string` column) — write the quarantine out for repair/audit. */
  final case class Quarantined(good: DataFrame, quarantine: DataFrame)

  /** Schema'd JSON-lines with QUARANTINE semantics: PERMISSIVE mode keeps
    * malformed lines in a corrupt-record column instead of dropping them
    * (the [[jsonLines]] DROPMALFORMED form discards them silently — right
    * for logs, wrong for paid-for training data, where every dropped row
    * should be accounted for). One scan feeds both frames; at 100 TB the
    * quarantine write is the audit trail that makes "we lost 0.3% of the
    * shipment" a queryable fact instead of a guess.
    *
    * Caveat (Spark semantics): a row whose JSON is well-formed but whose
    * values fail the schema's casts parses to nulls, not to quarantine —
    * pair with null-guard filters ([[graft.operators.Observe]] counters)
    * downstream. */
  def jsonLinesQuarantine(spark: SparkSession, path: String,
                          schema: StructType): Quarantined = {
    // one TEXT scan + from_json, not the json source's _corrupt_record
    // column: Spark disallows plans whose json SCAN references only the
    // corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    // and the documented workaround is caching — a cache entry this
    // library refuses to leak. from_json is a plain expression with no
    // such restriction; a corrupt-record field INSIDE its target schema
    // captures the raw text of unparseable lines (PERMISSIVE from_json
    // otherwise yields an all-null struct for them, indistinguishable from
    // a parsed row of nulls).
    import org.apache.spark.sql.functions.{col, from_json, lit}
    require(!schema.fieldNames.contains("_qc"),
      "schema must not already define _qc")
    val withCorrupt = schema.add("_qc", org.apache.spark.sql.types.StringType)
    val raw = spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        java.util.Map.of("columnNameOfCorruptRecord", "_qc")).as("r"))
    Quarantined(
      good = raw.where(col("r._qc").isNull).select("r.*").drop("_qc"),
      quarantine = raw.where(col("r._qc").isNotNull)
        .select(col("r._qc").as("raw")))
  }

  /** Raw media files as (path, modificationTime, length, content binary) —
    * the ingestion shape [[graft.operators.Multimodal.pack]] consumes. */
  def binaryFiles(spark: SparkSession, path: String,
                  glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
}
