package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `array<float>` /
  * `array<double>` columns (SURVEY §2.9 bucket 3: a custom `Expression`
  * beats a UDF beats anything else).
  *
  * The `zip_with`/`aggregate` higher-order-function formulation is correct
  * but evaluates interpreted (HOFs are CodegenFallback) with per-element
  * boxing; these expressions generate a tight primitive loop inside
  * whole-stage codegen — the difference between an ANN re-rank that is
  * memory-bandwidth-bound and one that is allocation-bound. Accumulation is
  * double, in index order, so results are bit-identical to the HOF form and
  * to the DuckDB oracle's `list_dot_product` on double arrays.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"expected array<float|double>, got $t")
  }

  protected def getter(arr: String, isFloat: Boolean, i: String): String =
    if (isFloat) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def readElem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** dot(a, b): sum over min-length of elementwise products. */
case class VectorDot(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += readElem(a, lf, i) * readElem(b, rf, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(a, lf, i)} * ${getter(b, rf, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) in ONE pass: accumulates a·b, a·a, b·b in the same loop,
  * then a·b / (sqrt(a·a) * sqrt(b·b)) — same arithmetic and order as the
  * three-dot formulation, one third of the memory traffic. */
case class VectorCosine(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    while (i < n) {
      val x = readElem(a, lf, i); val y = readElem(b, rf, i)
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    // zero-norm guard: 0/0 would be NaN, and Spark sorts NaN as the
    // LARGEST double — a zero vector would rank first in every top-k
    if (aa == 0.0 || bb == 0.0) 0.0
    else ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(a, lf, i)};
         |  double $y = ${getter(b, rf, i)};
         |  $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |}
         |${ev.value} = ($aa == 0.0 || $bb == 0.0)
         |  ? 0.0 : $ab / (Math.sqrt($aa) * Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
