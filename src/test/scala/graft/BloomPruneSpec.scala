package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

class BloomPruneSpec extends SparkSuite {
  import spark.implicits._

  test("long keys: result equals the plain anti-join, multiplicity included") {
    // duplicates in the big side must survive with their multiplicity
    val big = ((1L to 2000L) ++ (1L to 50L)).map(k => (k, s"p$k")).toDF("k", "p")
    val excl = (1L to 2000L by 3).toDF("k")
    val got = BloomPrune.antiJoin(big, excl, "k", expectedItems = 1024)
      .select("k", "p").as[(Long, String)].collect().sorted.toSeq
    val exp = big.join(excl, Seq("k"), "left_anti")
      .select("k", "p").as[(Long, String)].collect().sorted.toSeq
    assert(got == exp)
    assert(got.nonEmpty && got.size < 2050)
  }

  test("string keys: filter hashing matches the builder (no false negatives)") {
    val big = (1 to 500).map(i => s"user$i").toDF("k")
    val excl = (1 to 500 by 2).map(i => s"user$i").toDF("k")
    val got = BloomPrune.antiJoin(big, excl, "k", expectedItems = 512)
      .as[String].collect().toSet
    val exp = big.join(excl, Seq("k"), "left_anti").as[String].collect().toSet
    assert(got == exp)
    assert(got == (2 to 500 by 2).map(i => s"user$i").toSet)
  }

  test("null big-side keys are kept, matching plain left_anti semantics") {
    val big = Seq(Some(1L), Some(2L), None, Some(3L), None)
      .toDF("k")
    val excl = Seq(2L).toDF("k")
    val got = BloomPrune.antiJoin(big, excl, "k", expectedItems = 16)
      .as[Option[Long]].collect().toSeq
      .sortBy(_.getOrElse(Long.MinValue))
    val exp = big.join(excl, Seq("k"), "left_anti")
      .as[Option[Long]].collect().toSeq
      .sortBy(_.getOrElse(Long.MinValue))
    assert(got == exp)
    assert(got.count(_.isEmpty) == 2, "null-key rows must survive")
  }

  test("prune actually bypasses the join for most rows") {
    // with a tiny exclusion set, the 'maybe' branch must be a sliver:
    // count rows that probe positive — bounded by |true members| + fpp*n
    val big = (1L to 10000L).toDF("k")
    val excl = (1L to 100L).toDF("k")
    val probe = BloomPrune.mightContain(excl, "k", col("k"),
      expectedItems = 128, fpp = 0.03)
    val maybeCount = big.where(probe).count()
    assert(maybeCount >= 100, "true members must always probe positive")
    assert(maybeCount < 100 + 10000 * 0.1,
      s"fpp blowout: $maybeCount of 10000 probed positive")
  }
}
