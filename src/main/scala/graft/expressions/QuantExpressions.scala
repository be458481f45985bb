package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int8 embedding quantization kernels — the memory-bandwidth lever for
  * ANN at scale: a coarse scoring pass over int8 vectors reads 1/4 the
  * bytes of float32 (the pass is bandwidth-bound, so that is ~4x), and the
  * exact float re-rank then touches only the shortlist.
  *
  * Symmetric per-vector quantization: q[i] = round(v[i] * 127 / maxAbs),
  * so q ∈ [-127, 127]. COSINE needs no scale at all — the per-vector scale
  * multiplies out of the numerator and denominator — which is why the
  * quantized form stores just the bytes (BinaryType), not (scale, bytes).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"expected array<float|double>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val f = isFloat
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = math.abs(x); if (ax > maxAbs) maxAbs = ax
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0) {
      val s = 127.0 / maxAbs
      i = 0
      while (i < n) {
        val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.round(x * s).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (isFloat) s"(double)$a.getFloat" else s"$a.getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("maxAbs"); val s = ctx.freshName("scale")
      val x = ctx.freshName("x"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = Math.abs($get($i));
         |  if ($x > $m) $m = $x;
         |}
         |byte[] $out = new byte[$n];
         |if ($m > 0.0) {
         |  double $s = 127.0 / $m;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) Math.round($get($i) * $s);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine over two int8-quantized vectors (BinaryType): integer dot and
  * norms in one pass with long accumulators (127^2 * dim stays in range to
  * dim ~5.7e14), then the double ratio. The per-vector quantization scales
  * cancel, so this approximates the FLOAT cosine of the original vectors —
  * quantization noise only. Same zero-norm guard as [[VectorCosine]] (NaN
  * would sort first in a top-k). */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    val n = math.min(a.length, b.length)
    var ab = 0L; var aa = 0L; var bb = 0L; var i = 0
    while (i < n) {
      val x = a(i).toLong; val y = b(i).toLong
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    if (aa == 0L || bb == 0L) 0.0
    else ab / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($a.length, $b.length);
         |long $ab = 0L; long $aa = 0L; long $bb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a[$i]; long $y = $b[$i];
         |  $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |}
         |${ev.value} = ($aa == 0L || $bb == 0L)
         |  ? 0.0 : $ab / (Math.sqrt((double) $aa) * Math.sqrt((double) $bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): the vector is L2-normalized,
  * split into `m` subvectors, and each subvector is replaced by the index
  * of its nearest codebook centroid — `m` BYTES per vector instead of
  * `dim` floats. Codebooks are plan-embedded literals (m x K x dsub
  * doubles — a few KB), trained on a bounded driver sample exactly like
  * the IVF centroids.
  *
  * [[PqEncode]]: array<float|double> → binary (m codes).
  * [[PqScore]]: (query vector, corpus codes) → approximate cosine via
  * asymmetric distance computation — the query stays full-precision, the
  * corpus contributes centroid dot-products: Σ_j <q̂_j, c_j[code_j]>.
  */
object Pq {
  def normalize(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val v = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      v(i) = x; ss += x * x
      i += 1
    }
    if (ss > 0.0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < n) { v(i) *= inv; i += 1 }
    }
    v
  }
}

case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"expected array<float|double>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = Pq.normalize(input.asInstanceOf[ArrayData], isFloat)
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    if (v.length != m * dsub) return null // dim mismatch → drop row
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v(j * dsub + t) - cb(c)(t); d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class PqScore(left: Expression, right: Expression,
                   codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private lazy val isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"expected array<float|double> query vector, got $t")
  }

  override def nullSafeEval(q: Any, codes: Any): Any = {
    val v = Pq.normalize(q.asInstanceOf[ArrayData], isFloat)
    val code = codes.asInstanceOf[Array[Byte]]
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    if (v.length != m * dsub || code.length != m) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      val cent = codebooks(j)(code(j) & 0xff)
      var t = 0
      while (t < dsub) { s += v(j * dsub + t) * cent(t); t += 1 }
      j += 1
    }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
