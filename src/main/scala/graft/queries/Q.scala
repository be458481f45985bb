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

  /** DuckDB SQL replaying [[graft.expressions.Fnv1a64]] over `s` (any
    * VARCHAR SQL expression): the FNV-1a-64 fold over Unicode code points
    * in HUGEINT mod-2^64 arithmetic, returned as a signed BIGINT. Splice
    * this into oracles instead of hand-duplicating the arithmetic (the
    * d15 unbalanced-paren lesson, NOTES r5). */
  def fnvSql(s: String): String = {
    val step =
      s"""((CAST(xor(acc, cp) AS HUGEINT) + 18446744073709551616::HUGEINT)
         |                   % 18446744073709551616::HUGEINT * 1099511628211)
         |                  % 18446744073709551616::HUGEINT""".stripMargin
    s"""list_reduce(
       |      list_prepend(CAST(-3750763034362895579 AS BIGINT),
       |        list_transform(regexp_split_to_array($s, ''),
       |          c -> CAST(unicode(c) AS BIGINT))),
       |      (acc, cp) -> CAST(
       |        CASE WHEN $step >= 9223372036854775808::HUGEINT
       |             THEN $step - 18446744073709551616::HUGEINT
       |             ELSE $step END AS BIGINT))""".stripMargin
  }
}
