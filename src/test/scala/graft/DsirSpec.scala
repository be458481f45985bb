package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance weights + Gumbel resample on hand-computed inputs. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  // gram -> bucket mapping small enough to trace by hand
  private val bucketOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    g => when(g === "a", lit(0L)).when(g === "b", lit(1L))
      .when(g === "a a", lit(2L)).otherwise(lit(3L))

  private def toyDocs = Seq(
    (1L, Seq("a", "a", "a a"), true),   // target
    (2L, Seq("b"), false),
    (3L, Seq("a", "b", "a b"), false)
  ).toDF("id", "grams", "tt")

  test("importanceWeights matches the hand-computed log-likelihood ratios") {
    // target counts: a:2, "a a":1 (Nt=3); raw: a:3 b:2 "a a":1 "a b":1 (Nr=7)
    val lr0 = math.log(3.0 / 7) - math.log(4.0 / 11)
    val lr1 = math.log(1.0 / 7) - math.log(3.0 / 11)
    val lr2 = math.log(2.0 / 7) - math.log(2.0 / 11)
    val lr3 = math.log(1.0 / 7) - math.log(2.0 / 11)
    val got = Dsir.importanceWeights(toyDocs, "id", col("grams"), col("tt"),
        buckets = 4, bucketOf = bucketOf)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(math.abs(got(1L)._1 - (2 * lr0 + lr2)) < 1e-12)
    assert(got(1L)._2 == 3L)
    assert(math.abs(got(2L)._1 - lr1) < 1e-12)
    assert(got(2L)._2 == 1L)
    assert(math.abs(got(3L)._1 - (lr0 + lr1 + lr3)) < 1e-12)
    assert(got(3L)._2 == 3L)
    // the target doc scores strictly highest
    assert(got(1L)._1 > got(2L)._1 && got(1L)._1 > got(3L)._1)
  }

  test("importanceWeights reuses the per-(doc,bucket) exchange across consumers") {
    val df = Dsir.importanceWeights(toyDocs, "id", col("grams"), col("tt"),
      buckets = 4, bucketOf = bucketOf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected the docb aggregate exchange to be reused, got:\n$plan")
  }

  test("unigramBigram forms space-joined bigrams and degrades to unigrams") {
    val got = Seq(Seq("x"), Seq("x", "y", "z")).toDF("toks")
      .select(Dsir.unigramBigram(col("toks")).as("g"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("x"))
    assert(got(1) == Seq("x", "y", "z", "x y", "y z"))
  }

  test("resampleTopK is deterministic and follows the Gumbel keys") {
    val w = Seq((1L, 10.0), (2L, 0.0), (3L, -10.0)).toDF("id", "logw")
    val u = lit(0.5)   // constant u => selection is pure argmax of logw
    val got = Dsir.resampleTopK(w, "id", "logw", u, k = 2)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
    val again = Dsir.resampleTopK(w, "id", "logw", u, k = 2)
      .select("id").as[Long].collect().sorted
    assert(again.toSeq == got.toSeq)
  }
}
