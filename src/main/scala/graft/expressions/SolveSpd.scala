package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Solve the n×n symmetric positive-definite system A·x = b per row —
  * the per-key kernel of the ALS normal-equations half-step
  * ([[graft.model.Collaborative.solveUserFactors]]): A arrives as the
  * row-major flattened array<double> of length n², b as array<double> of
  * length n. Cholesky without pivoting (A = L·Lᵀ, then forward/back
  * substitution) — the same factorization MLlib's CholeskyDecomposition
  * uses for ALS solves, so the engine's half-step and MLlib's agree to
  * float rounding.
  *
  * Raises on non-SPD input (a non-positive pivot): for ALS normal
  * equations A = Σ y·yᵀ + λ·I with λ > 0 this cannot happen, so a
  * failure means the caller assembled A wrong — loud beats a NaN factor
  * served to users. Eval-mode (CodegenFallback) like the other per-row
  * kernels: the loop is primitive, allocation is one output array, and
  * n is small (the factor rank), so codegen would only bloat.
  */
case class SolveSpd(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "solve_spd"

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val aArr = aAny.asInstanceOf[ArrayData].toDoubleArray()
    val b = bAny.asInstanceOf[ArrayData].toDoubleArray()
    val n = b.length
    require(aArr.length == n.toLong * n,
      s"solve_spd: A has ${aArr.length} elements, expected n²=${n * n} " +
        s"for b of length $n")
    // Cholesky: L (lower) in place over a copy, column order —
    // L(i)(j) = (A(i)(j) - Σ_{k<j} L(i)(k)L(j)(k)) / L(j)(j)
    val l = new Array[Double](n * n)
    var j = 0
    while (j < n) {
      var s = aArr(j * n + j)
      var k = 0
      while (k < j) { s -= l(j * n + k) * l(j * n + k); k += 1 }
      require(s > 0,
        s"solve_spd: non-positive pivot at column $j — matrix is not " +
          "positive definite (was the ridge term added?)")
      val ljj = math.sqrt(s)
      l(j * n + j) = ljj
      var i = j + 1
      while (i < n) {
        var t = aArr(i * n + j)
        k = 0
        while (k < j) { t -= l(i * n + k) * l(j * n + k); k += 1 }
        l(i * n + j) = t / ljj
        i += 1
      }
      j += 1
    }
    // forward substitution: L·y = b
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = b(i)
      var k = 0
      while (k < i) { s -= l(i * n + k) * y(k); k += 1 }
      y(i) = s / l(i * n + i)
      i += 1
    }
    // back substitution: Lᵀ·x = y
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = y(i)
      var k = i + 1
      while (k < n) { s -= l(k * n + i) * x(k); k += 1 }
      x(i) = s / l(i * n + i)
      i -= 1
    }
    new GenericArrayData(x)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
