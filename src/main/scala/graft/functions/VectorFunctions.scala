package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns, built from
  * `zip_with`/`aggregate` so it stays codegen'd — no UDF, no driver loop.
  * Used by the similarity-search surface (brute-force and LSH ANN) over
  * `embeddings.embedding: array<float>`.
  *
  * All accumulation is in double precision regardless of the input element
  * type (float inputs are upcast per element), so results are stable across
  * engines and across partitioning.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane sign bit: sign(v · h) as 0/1, for SimHash-style LSH
    * signatures over dense embeddings. `h` is a literal array column. */
  def hyperplaneSignBit(v: Column, h: Column): Column =
    when(dot(v, h) >= 0, lit(1)).otherwise(lit(0))
}
