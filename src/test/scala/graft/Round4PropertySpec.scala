package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{EntityResolution, Funnel, Graph, SnapshotDiff}

/** Property-based invariants for the round-4 session-2 operators, driven
  * by seeded scalacheck samples (the PropertySpecs harness). */
class Round4PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong * 104729)))

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)))
      .map(_.filter(e => e._1 != e._2))

  test("components property: labels are a fixpoint and members share labels") {
    samples(edgeGen, 8).filter(_.nonEmpty).foreach { edges =>
      val df = edges.toDF("src", "dst")
      val comp = Graph.connectedComponents(df, "src", "dst")
        .as[(Long, Long)].collect().toMap
      // every edge's endpoints share a component
      edges.foreach { case (a, b) =>
        assert(comp(a) == comp(b), s"edge ($a,$b) split in $comp") }
      // the component label is itself a member mapping to itself
      comp.values.toSet.foreach { c: Long => assert(comp(c) == c) }
      // re-running on the (id -> component) mapping as edges is a fixpoint
      val again = Graph.connectedComponents(
          comp.toSeq.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      comp.foreach { case (id, c) => assert(again(id) == c) }
    }
  }

  test("triangles property: per-vertex counts sum to 3x the triangle total") {
    samples(edgeGen, 8).filter(_.nonEmpty).foreach { edges =>
      val got = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect()
      assert(got.map(_._2).sum % 3 == 0, s"non-3-divisible sum for $edges")
    }
  }

  test("diff property: diff(x, x) is all-unchanged; statuses partition ids") {
    val rowsGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(1L, 20L), Gen.alphaStr.map(_.take(6))))
      .map(_.distinctBy(_._1))
    samples(rowsGen, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "v")
      val self = SnapshotDiff.diff(df, df, "id", Seq("v"))
        .as[(Long, String)].collect()
      assert(self.forall(_._2 == "unchanged"), s"self-diff not unchanged")
      assert(self.length == rows.length)
    }
  }

  test("funnel property: stage counts are non-increasing") {
    val evGen = Gen.listOfN(40, Gen.zip(
      Gen.choose(1L, 8L), Gen.oneOf("a", "b", "c"), Gen.choose(0L, 100L)))
    samples(evGen, 8).filter(_.nonEmpty).foreach { evs =>
      val counts = Funnel.funnelCounts(evs.toDF("u", "et", "t"),
          "u", "et", "t", Seq("a", "b", "c"))
        .select("n_users").as[Long].collect().toSeq
      assert(counts.zip(counts.tail).forall { case (x, y) => y <= x },
        s"funnel grew: $counts for $evs")
    }
  }

  test("entity resolution property: canonical names are idempotent") {
    val nameGen = Gen.listOfN(12, Gen.zip(Gen.choose(1L, 100L),
      Gen.oneOf("acme corp", "acme  corp", "acme corpx", "beta llc",
        "beta  llc", "gamma inc")))
      .map(_.distinctBy(_._1))
    samples(nameGen, 8).filter(_.nonEmpty).foreach { recs =>
      val r1 = EntityResolution.resolve(recs.toDF("id", "name"),
          "id", "name", maxDistance = 2, blockPrefixLen = 3)
        .select("id", "entity").as[(Long, String)].collect().toMap
      // resolving the RESOLVED entities changes nothing (canonical forms
      // are their own fixpoint)
      val r2 = EntityResolution.resolve(
          r1.toSeq.toDF("id", "name"), "id", "name",
          maxDistance = 2, blockPrefixLen = 3)
        .select("id", "entity").as[(Long, String)].collect().toMap
      r1.foreach { case (id, e) => assert(r2(id) == e,
        s"not idempotent for $id: ${r2(id)} vs $e") }
    }
  }
}
