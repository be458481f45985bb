package graft

import org.apache.spark.sql.functions._
import graft.rank.Diversify

/** MMR semantics on hand-computable vectors: the first pick is pure
  * relevance; later picks trade relevance against similarity to what is
  * already picked. */
class DiversifySpec extends SparkSuite {
  import spark.implicits._

  private val e1 = Array(1f, 0f)
  private val e2 = Array(0f, 1f)

  test("redundant runner-up loses to a diverse lower-relevance item") {
    // A (rel .9, e1) picked first. B (rel .85) duplicates A's direction:
    // score = .5*.85 - .5*1 = -0.075; C (rel .5, e2) orthogonal:
    // score = .5*.5 - 0 = .25 → C wins round 2.
    val df = Seq(
      (1L, 10L, 0.9, e1), (1L, 11L, 0.85, e1), (1L, 12L, 0.5, e2)
    ).toDF("q", "item", "rel", "vec")
    val got = Diversify.mmrPerQuery(df, "q", "item", "rel", "vec",
        k = 2, lambda = 0.5)
      .select("item", "rank", "mmr").as[(Long, Int, Double)]
      .collect().sortBy(_._2)
    assert(got.map(r => (r._1, r._2)).toSeq == Seq((10L, 1), (12L, 2)))
    assert(math.abs(got(0)._3 - 0.45) < 1e-12)   // .5 * .9, no penalty yet
    assert(math.abs(got(1)._3 - 0.25) < 1e-12)
  }

  test("lambda = 1 reduces to pure relevance order") {
    val df = Seq(
      (1L, 10L, 0.9, e1), (1L, 11L, 0.85, e1), (1L, 12L, 0.5, e2)
    ).toDF("q", "item", "rel", "vec")
    val got = Diversify.mmrPerQuery(df, "q", "item", "rel", "vec",
        k = 3, lambda = 1.0)
      .orderBy("rank").select("item").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L, 12L))
  }

  test("queries are independent and k caps the output per query") {
    val df = Seq(
      (1L, 10L, 0.9, e1), (1L, 11L, 0.8, e2),
      (2L, 20L, 0.7, e2)
    ).toDF("q", "item", "rel", "vec")
    val got = Diversify.mmrPerQuery(df, "q", "item", "rel", "vec",
        k = 1, lambda = 0.5)
      .select("query", "item").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("over-cap candidate lists fail fast instead of buffering unbounded") {
    val df = (1 to 50).map(i => (1L, i.toLong, 1.0 / i, e1))
      .toDF("q", "item", "rel", "vec")
    val ex = intercept[org.apache.spark.SparkException] {
      Diversify.mmrPerQuery(df, "q", "item", "rel", "vec",
        k = 2, lambda = 0.5, maxCandidates = 10).collect()
    }
    assert(ex.getMessage.contains("candidates") ||
      Option(ex.getCause).exists(_.getMessage.contains("candidates")))
  }
}
