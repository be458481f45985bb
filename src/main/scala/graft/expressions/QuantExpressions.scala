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
