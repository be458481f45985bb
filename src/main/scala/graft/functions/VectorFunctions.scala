package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns. The hot kernels
  * (dot, cosine) are native Catalyst expressions with `doGenCode`
  * ([[graft.expressions.VectorDot]]/[[graft.expressions.VectorCosine]]) —
  * a tight primitive loop inside whole-stage codegen, no boxing, no UDF.
  * Used by the similarity-search surface (brute-force/LSH/IVF ANN) over
  * `embeddings.embedding: array<float>`.
  *
  * All accumulation is in double precision in index order regardless of the
  * input element type, so results are bit-stable across engines and across
  * partitioning (the DuckDB oracle's `list_dot_product` on double arrays
  * produces identical values).
  */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def dot(a: Column, b: Column): Column =
    column(graft.expressions.VectorDot(expression(a), expression(b)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    column(graft.expressions.VectorCosine(expression(a), expression(b)))

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

  /** Symmetric per-vector int8 quantization → binary (1/4 the bytes of
    * float32; cosine over the quantized form needs no scale). */
  def int8Quantize(v: Column): Column =
    column(graft.expressions.Int8Quantize(expression(v)))

  /** Cosine over two [[int8Quantize]]d vectors — approximates the float
    * cosine of the originals (quantization noise only). */
  def int8Cosine(a: Column, b: Column): Column =
    column(graft.expressions.Int8Cosine(expression(a), expression(b)))
}
