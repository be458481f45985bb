package graft

import org.apache.spark.sql.functions._
import graft.rank.HardNegatives

/** Hard-negative mining on hand-computed 2-d unit vectors. */
class HardNegativesSpec extends SparkSuite {
  import spark.implicits._

  // angles on the unit circle: cosine(a, b) = cos(θa − θb), exact by hand
  private def vec(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private def items = Seq(
    (0L, vec(0), 0),     // query, label 0
    (1L, vec(10), 0),    // positive, cos ≈ 0.985
    (2L, vec(20), 1),    // negative, cos ≈ 0.940  (hardest negative)
    (3L, vec(60), 1),    // negative, cos = 0.5
    (4L, vec(180), 2)    // negative, cos = −1
  ).toDF("id", "v", "label")

  test("ranks negatives by cosine and reports the triplet margin") {
    val got = HardNegatives.mine(items.where(col("id") === 0), items,
        "id", "v", "label", k = 2)
      .orderBy("rank")
      .select("neighbor_id", "cosine", "rank", "margin")
      .as[(Long, Double, Int, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(2L, 3L))
    assert(math.abs(got(0)._2 - math.cos(math.toRadians(20))) < 1e-6)
    // margin = cos(10°) − cos(20°) for the hardest negative
    assert(math.abs(got(0)._4 -
      (math.cos(math.toRadians(10)) - math.cos(math.toRadians(20)))) < 1e-6)
    assert(got(1)._4 > got(0)._4)   // margins widen down the ranking
  }

  test("query without any positive yields NULL margin, negatives still rank") {
    val solo = Seq((9L, vec(0), 7)).toDF("id", "v", "label")
      .union(items.where(col("id") =!= 0))
    val got = HardNegatives.mine(solo.where(col("id") === 9), solo,
        "id", "v", "label", k = 10)
      .select(col("neighbor_id"), col("margin").isNull.as("nullMargin"))
      .as[(Long, Boolean)].collect()
    assert(got.length == 4 && got.forall(_._2))
  }

  test("positives never appear among mined negatives") {
    val got = HardNegatives.mine(items.where(col("id") === 0), items,
        "id", "v", "label", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L))
  }
}
