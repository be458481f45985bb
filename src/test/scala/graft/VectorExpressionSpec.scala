package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The native codegen kernels must be bit-identical to the interpreted
  * higher-order-function formulation (same accumulation order). */
class VectorExpressionSpec extends SparkSuite {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("VectorDot/VectorCosine match the HOF formulation bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("nat"),
      hofDot(col("a"), col("b")).as("hof"),
      VectorFunctions.cosine(col("a"), col("b")).as("natCos"),
      (hofDot(col("a"), col("b")) /
        (sqrt(hofDot(col("a"), col("a"))) * sqrt(hofDot(col("b"), col("b")))))
        .as("hofCos"))
      .as[(Double, Double, Double, Double)].collect()
    cmp.foreach { case (n, h, nc, hc) =>
      assert(n == h, s"dot mismatch: $n vs $h")
      assert(nc == hc, s"cosine mismatch: $nc vs $hc")
    }
  }

  test("mixed float/double element types are supported (hyperplane path)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5, -1.0, 2.0))).toDF("f", "d")
    val got = df.select(VectorFunctions.dot(col("f"), col("d")))
      .as[Double].collect().head
    assert(got == 1.0 * 0.5 - 2.0 + 6.0)
  }
}
