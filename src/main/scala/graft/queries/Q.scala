package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared engine query: the Spark plan plus (where SQL-expressible) the
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  * Column names/types must match exactly between the two (driver compares
  * after sorting columns by name). Every query is fully deterministic:
  * total-order sorts, rounded floating-point outputs, seeded randomness. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
