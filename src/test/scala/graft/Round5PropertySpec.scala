package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Constraints, Dedup, RangeJoin, Sampling}

/** Property-based invariants for the round-5 operators (X114–X118),
  * driven by seeded scalacheck samples (the PropertySpecs harness). */
class Round5PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong * 104729)))

  private val intervalsGen: Gen[List[(Long, Double, Double)]] =
    Gen.listOfN(25, Gen.zip(Gen.choose(-40.0, 40.0), Gen.choose(0.0, 30.0)))
      .map(_.zipWithIndex.map { case ((lo, span), i) =>
        (i.toLong + 1, lo, lo + span) })

  test("intervalOverlap property: equals the naive join at several widths") {
    samples(intervalsGen, 4).foreach { as =>
      // ~14% of the shifted b intervals come out inverted (lo > hi) —
      // deliberately kept: they are EMPTY and must never match (the naive
      // reference filters them the same way the operator does; a bare
      // overlap predicate would wrongly match some inverted intervals)
      val bs = as.map { case (i, lo, hi) => (i + 100, lo + 7.3, hi + 3.1) }
      val a = as.toDF("a", "lo_a", "hi_a")
      val b = bs.toDF("b", "lo_b", "hi_b")
      val naive = a.where(col("lo_a") <= col("hi_a"))
        .crossJoin(b.where(col("lo_b") <= col("hi_b")))
        .where(col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
        .select("a", "b").as[(Long, Long)].collect().sorted.toSeq
      for (w <- Seq(3.0, 11.0, 50.0)) {
        val got = RangeJoin
          .intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b", w)
          .select("a", "b").as[(Long, Long)].collect().sorted.toSeq
        assert(got == naive, s"width $w disagreed with naive")
        assert(got.distinct == got, s"width $w duplicated a pair")
      }
    }
  }

  test("stratifiedFixedK property: per-stratum count = min(k, n); " +
    "sample of a superset restricted to old strata contains no new members " +
    "only if sizes allow — weaker invariant: determinism across shuffles") {
    val rowsGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(1L, 500L), Gen.oneOf("a", "b", "c")))
      .map(_.distinctBy(_._1))
    samples(rowsGen, 6).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "s")
      val got = Sampling.stratifiedFixedK(df, Seq("s"), "id", 11L, k = 7)
        .as[(Long, String)].collect().toSet
      val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
      got.groupBy(_._2).foreach { case (s, g) =>
        assert(g.size == math.min(7, sizes(s))) }
      sizes.foreach { case (s, n) =>
        assert(got.count(_._2 == s) == math.min(7, n)) }
      // membership invariant under physical layout
      val reshuffled = Sampling.stratifiedFixedK(
          df.repartition(7, col("id")), Seq("s"), "id", 11L, k = 7)
        .as[(Long, String)].collect().toSet
      assert(reshuffled == got)
    }
  }

  test("audit property: conformance/completeness in [0,1]; " +
    "all-pass on a table satisfying its own checks") {
    val rowsGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(1L, 1000000L), Gen.choose(0.0, 100.0)))
      .map(_.distinctBy(_._1))
    samples(rowsGen, 6).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "v")
      val out = Constraints.audit(df, Seq(
        Constraints.Check("c", Constraints.completeness(col("v")), 1.0),
        Constraints.Check("u", Constraints.uniqueness(col("id")), 1.0),
        Constraints.Check("r",
          Constraints.conformance(col("v") >= 0.0 && col("v") <= 100.0), 1.0)))
        .as[(String, Double, Double, Long)].collect()
      assert(out.forall(_._4 == 1L), s"self-satisfying table failed: ${out.toSeq}")
      assert(out.forall(r => r._2 >= 0.0 && r._2 <= 1.0))
    }
  }

  test("cdcChunks property: partitions arbitrary unicode text exactly") {
    val textGen = Gen.listOfN(300, Gen.frequency(
      8 -> Gen.alphaNumChar,
      1 -> Gen.oneOf(' ', '\n', '\t'),
      1 -> Gen.oneOf('世', '界', 'é', 'ß'))).map(_.mkString)
    samples(Gen.listOfN(5, textGen), 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = Dedup.cdcChunks(docs, "doc_id", "text", maskBits = 4)
        .as[(Long, Long, Long, Long, String)].collect()
      texts.zipWithIndex.foreach { case (t, i) =>
        val cs = chunks.filter(_._1 == i.toLong).sortBy(_._2)
        assert(cs.head._3 == 0L)
        cs.sliding(2).foreach {
          case Array(x, y) => assert(x._3 + x._4 == y._3); case _ => }
        assert(cs.last._3 + cs.last._4 == t.codePointCount(0, t.length))
      }
    }
  }
}
