package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * pipeline surface) is declared here as a named query over the driver's
  * synthetic tables, paired with an ANSI-SQL DuckDB oracle where the
  * semantics are SQL-expressible.
  */
object SparkEntry {

  private def allQueries: Seq[Q] = {
    val qs = Relational.queries ++ Relational2.queries ++ Text.queries ++
      Similarity.queries ++ Ml.queries ++ Olap.queries ++ Lm.queries
    // duplicate names would be silently collapsed by .toMap below — and
    // could pair one query's plan with ANOTHER query's oracle
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_broadcast_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
