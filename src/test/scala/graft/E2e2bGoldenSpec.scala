package graft

import org.apache.spark.sql.functions._

/** Round-11 standing guard for the off-toy-scale e2e2b adjudication: the
  * r10 round proved the 4,000-doc sf0.1 run hash-matches DuckDB, but the
  * oracle side ground for ~80 minutes — unrepeatable per round. This spec
  * re-runs the SAME Spark builder (Text.e2e2b(4000)) every round and
  * compares a committed golden summary: row count, per-split survivor
  * counts, total token count, and an order-independent full-result
  * fingerprint (bit_xor of per-row xxhash64 over every output column —
  * XOR, not sum: ANSI mode makes a 2,700-term hash sum overflow). Any
  * exact-mode drift off toy scale — a survivor set change, a quality
  * recalibration, a pack boundary shift — moves at least one of these.
  *
  * The golden was generated from the r10-adjudicated code path (commit
  * d0d6a56, whose IVF sizing change is result-invariant by Round11Spec).
  * If a DELIBERATE semantic change moves these numbers, re-adjudicate
  * with tools/E2e2bScale + tools/check.py (the 80-minute DuckDB run) and
  * update the golden in the same commit. */
class E2e2bGoldenSpec extends SparkSuite {

  test("e2e2b at 4,000 docs on sf0.1 matches the adjudicated golden summary") {
    assume(new java.io.File("/root/testdata/sf0.1/documents.parquet").exists)
    val out = graft.queries.Text.e2e2b(4000)
      .fn(spark, "/root/testdata/sf0.1")
    val summary = out.agg(
      count(lit(1)).as("rows"),
      count_distinct(col("doc_id")).as("docs"),
      sum(col("n_tokens")).as("tokens"),
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("val"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("test"),
      bit_xor(xxhash64(col("doc_id"), col("quality"), col("lang"),
        col("split"), col("n_tokens"), col("bucket"), col("pack_id"),
        col("content_md5"))).as("fp")).head()
    val got = (summary.getLong(0), summary.getLong(1), summary.getLong(2),
      summary.getLong(3), summary.getLong(4), summary.getLong(5),
      summary.getLong(6))
    assert(got == E2e2bGoldenSpec.Golden,
      s"e2e2b 4k-doc summary drifted from the adjudicated golden:\n" +
        s"  got    $got\n  golden ${E2e2bGoldenSpec.Golden}\n" +
        "If this change is deliberate, re-adjudicate with tools/E2e2bScale " +
        "+ tools/check.py and update the golden in the same commit.")
  }
}

object E2e2bGoldenSpec {
  /** (rows, docs, tokens, train, val, test, fingerprint) of the
    * adjudicated 4,000-doc run — see the class doc for provenance. */
  val Golden: (Long, Long, Long, Long, Long, Long, Long) =
    (3647L, 3647L, 197131L, 3276L, 166L, 205L, 5214777250438146328L)
}
