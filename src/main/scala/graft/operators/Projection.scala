package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/** Embedding dimension reduction — the step in front of the ANN family
  * that makes 100 TB similarity work affordable: project once at ingest,
  * then every LSH signature / IVF probe / brute-force shortlist reads and
  * multiplies `outDim` components instead of the raw model dimension.
  *
  * [[sparseRandomProject]] is a seeded sparse (±1/0) random projection
  * ([[graft.expressions.SparseRandomProject]]): data-independent (no fit,
  * no driver state, no broadcast — unlike PCA there is nothing to train or
  * ship), a pure scan-speed projection that Johnson–Lindenstrauss bounds
  * make distance-faithful. Deterministic in (seed, dims) and bit-stable
  * across partitionings, so projected corpora are reproducible across
  * rounds and replayable in SQL (the rp1 gate value-checks it against a
  * DuckDB rebuild of the sign matrix).
  */
object Projection {

  /** Project `vecCol` (any numeric array) down to `outDim` doubles as
    * column `projected`, keeping `idCol`. Zero shuffle: the plan is a
    * single projection over the scan. */
  def sparseRandomProject(df: DataFrame, idCol: String, vecCol: String,
                          outDim: Int, seed: Long = 42L): DataFrame =
    df.select(col(idCol),
      projectColumn(col(vecCol), outDim, seed).as("projected"))

  /** Column form, for composing inside wider projections. */
  def projectColumn(vec: Column, outDim: Int, seed: Long = 42L): Column =
    column(graft.expressions.SparseRandomProject(
      expression(vec.cast("array<double>")), outDim, seed))
}
