package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE does not cover.
  *
  * AQE splits skewed partitions of a shuffle JOIN at runtime, but a skewed
  * aggregation key still funnels every row of the hot key through one
  * reducer, and a join whose hot key sits in BOTH sides cannot be split
  * losslessly. Salting is the classical fix (pre-AQE Spark folklore,
  * documented in the Spark performance-tuning guide): spread each hot key
  * over `salts` sub-keys for the wide phase, then recombine.
  *
  * Both operators are deterministic (salt = row-content hash, not rand()),
  * so results are reproducible and exactly equal to their unsalted
  * equivalents — asserted by the a15/j11 oracle queries and SkewSpec.
  */
object Skew {

  /** Row-content salt in [0, salts): hash of the full row MIXED WITH a
    * per-row monotonic id, so even bit-identical duplicate rows (a hot key
    * with no distinguishing payload — the worst skew case) spread across
    * salts instead of piling onto one reducer. Safe despite the id's
    * formal nondeterminism: both operators' RESULTS are invariant to the
    * salt assignment (the salt only picks which reducer a row visits), so
    * a task retry that re-salts differently still recombines to the same
    * answer — asserted by the a15/j11 oracle queries. */
  private[graft] def salt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col) :+ monotonically_increasing_id(): _*),
      lit(salts.toLong))

  /** Two-phase salted sum: partial-aggregate on (keys, salt) — ≤ salts
    * rows per hot key reach any one reducer — then final-aggregate on
    * keys. Only algebraic aggregates (sum/count/min/max) re-combine like
    * this; use partial counts + sums for averages. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: String,
                out: String, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive (got $salts)")
    val partial = df.withColumn("__salt", salt(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(value)).as("__partial"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out))
  }

  /** Salted inner equi-join for a skewed fact key: fact rows take a
    * content-hash salt, the (small-but-not-broadcastable) right side is
    * replicated `salts` times, and the join key becomes (key, salt) — the
    * hot key's rows now land on `salts` reducers instead of one. Right-
    * side cost is |right| x salts rows shuffled; keep salts modest. */
  def saltedJoin(fact: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive (got $salts)")
    val fs = fact.withColumn("__salt", salt(fact, salts))
    val rs = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    fs.join(rs, Seq(key, "__salt")).drop("__salt")
  }
}
