package graft.prep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Daily page-view log ingestion (SURVEY §2.1 S5/S6/S7, §2.4 A5).
  *
  * Reference (log_analyze.py:21-37,40-62): reads
  * `/home/docker/logs/YYYY/MM/DD/book.log`, a headerless >= 6-column CSV;
  * keeps columns 0 (userId) and 5 (bookId); treats 0 as a null sentinel;
  * silently skips malformed lines; builds per-user distinct book sets
  * capped at 20 by random sampling.
  *
  * Spark-first: explicit schema, `try_cast`-style tolerant casts (cast
  * failures become nulls become dropped rows — the reference's
  * skip-bad-lines), distinct via `collect_set`, and a *seeded* cap-sample:
  * order the set by a keyed hash and slice — deterministic across runs and
  * partitionings, unlike the reference's unseeded `random.sample`
  * (log_analyze.py:57; determinism policy SURVEY §4.2).
  */
object LogIngest {

  val logSchema: StructType = StructType(
    (0 to 5).map(i => StructField(s"_c$i", StringType)))

  /** Resolve yesterday's log path under `root` (layout YYYY/MM/DD/book.log,
    * log_analyze.py:42-45). Deterministic for tests via explicit `date`. */
  def dailyLogPath(root: String, date: java.time.LocalDate): String =
    f"$root/${date.getYear}%04d/${date.getMonthValue}%02d/${date.getDayOfMonth}%02d/book.log"

  /** S7: the reference skips the whole day when the log file is missing
    * (log_analyze.py:46,58-61) — a driver-side existence check before any
    * job is built, not a task-time failure. */
  def logExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Raw log -> (userId, bookId) with tolerant int casts and the 0-sentinel
    * dropped. Lines are split manually (text scan + split) rather than via
    * the CSV parser with a fixed schema: the log is ">= 6 columns" and the
    * reference tolerates trailing fields (pandas usecols=[0,5],
    * log_analyze.py:47) — a fixed-arity CSV schema under DROPMALFORMED
    * would silently drop every line with extra columns. */
  def parseLog(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), ",").as("f"))
      .where(size(col("f")) >= 6)
      .select(
        expr("try_cast(f[0] AS BIGINT)").as("userId"),
        expr("try_cast(f[5] AS BIGINT)").as("bookId"))
      .where(col("userId").isNotNull && col("bookId").isNotNull &&
        col("userId") > 0 && col("bookId") > 0)

  /** Per-user distinct books, capped at `cap` with a seeded hash-order
    * sample (keep-all when under the cap — log_analyze.py:51,57). */
  def userBookSets(views: DataFrame, cap: Int = 20, seed: Long = 42L): DataFrame =
    views
      .groupBy("userId")
      .agg(collect_set(col("bookId")).as("bookSet"))
      .select(col("userId"),
        slice(
          transform(
            sort_array(transform(col("bookSet"),
              b => struct(xxhash64(b, col("userId"), lit(seed)).as("h"), b.as("b")))),
            s => s.getField("b")),
          1, cap).as("books"))
}
