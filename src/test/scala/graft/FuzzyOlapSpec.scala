package graft

import org.apache.spark.sql.functions._
import graft.operators.{FuzzyJoin, Dedup}

/** Edit-distance fuzzy join: the length prune + thresholded kernel must be
  * EXACTLY the brute-force unpruned filter (the prune is a necessary
  * condition, so no pair may be lost), and distances must be true
  * Levenshtein. */
class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  private val words = Seq(
    (1L, "small ring"), (2L, "small rings"), (3L, "smal ring"),
    (4L, "large ring"), (5L, "small king"), (6L, "entirely different"),
    (7L, "smallring"), (8L, "ring small"), (9L, ""), (10L, "sm"))

  test("blocked+thresholded result equals brute force at maxDist=2") {
    val df = words.toDF("id", "t")
    val got = FuzzyJoin.editDistanceForQueries(df, "id", "t",
        queryPred = col("id") <= 3, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // reference: full O(n*m) DP on the driver
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val exp = (for {
      (a, ta) <- words if a <= 3
      (b, tb) <- words if a != b
      dist = lev(ta, tb) if dist <= 2
    } yield (a, b, dist)).toSet
    assert(got == exp)
    assert(exp.nonEmpty)   // the fixture actually exercises matches
  }

  test("jaro-winkler join: length-ratio prune preserves completeness vs " +
    "unpruned brute force") {
    // strings chosen to straddle the prune boundary at minSim = 0.9
    // (ratio >= 0.5): near-dups, a short prefix of a long string (pruned
    // AND genuinely below threshold), exact dups, empties
    val rows = Seq(
      (1L, "johnathan smith"), (2L, "jonathan smith"), (3L, "johnathan smyth"),
      (4L, "jo"), (5L, "completely other"), (6L, "johnathan smith"),
      (7L, ""), (8L, "johnathan")) // 9/15 ratio: prune must NOT drop it
      .toDF("id", "t")
    val got = FuzzyJoin.jaroWinklerForQueries(rows, "id", "t",
        queryPred = col("id") <= 2, minSim = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val data = Seq((1L, "johnathan smith"), (2L, "jonathan smith"),
      (3L, "johnathan smyth"), (4L, "jo"), (5L, "completely other"),
      (6L, "johnathan smith"), (7L, ""), (8L, "johnathan"))
    val exp = (for {
      (a, ta) <- data if a <= 2
      (b, tb) <- data if a != b
      jw = graft.expressions.JaroWinkler.similarity(ta, tb) if jw >= 0.9
    } yield (a, b)).toSet
    assert(got == exp)
    assert(exp.nonEmpty)
    // and the kernel agrees with itself across the column/driver paths
    assert(got.contains((1L, 6L))) // exact dup pair survives
  }

  test("maxDist=0 degenerates to exact equality on distinct ids") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "t")
    val got = FuzzyJoin.editDistanceForQueries(df, "id", "t",
        queryPred = col("id") === 1, maxDist = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0)))
  }
}

/** Containment: asymmetric by construction — a short query inside a long
  * corpus doc scores ~1 while the Jaccard of the pair is low. */
class ContainmentSpec extends SparkSuite {
  import spark.implicits._

  test("query embedded in a longer doc scores 1.0; reverse orientation does not") {
    val short = "the quick brown fox"
    val long = s"prefix words before $short and plenty of trailing material after it"
    val df = Seq((1L, short), (2L, long), (3L, "unrelated text entirely")).toDF("id", "text")
    val got = Dedup.ngramContainmentForQueries(df, "id", "text", n = 3,
        queryPred = col("id") === 1, minContainment = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(got.head._3 == 1.0)   // every query shingle appears in the long doc
    // orientation flipped: the long doc is NOT contained in the short one
    val rev = Dedup.ngramContainmentForQueries(df, "id", "text", n = 3,
        queryPred = col("id") === 2, minContainment = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(rev.isEmpty)
  }

  test("hashed fast path produces identical scores to string shingles") {
    val docs = (1L to 40L).map(i =>
      (i, s"document number $i with shared boilerplate preamble " +
        (if (i % 4 == 0) "and a common suffix block" else s"and unique tail $i")))
      .toDF("id", "text")
    def run(hashed: Boolean) =
      Dedup.ngramContainmentForQueries(docs, "id", "text", n = 3,
          queryPred = col("id") <= 8, minContainment = 0.3, hashed = hashed)
        .select(col("a"), col("b"), round(col("containment"), 9).as("c"))
        .as[(Long, Long, Double)].collect().toSet
    assert(run(hashed = true) == run(hashed = false))
  }
}

/** OLAP lattice sanity against hand-computable fixtures: ROLLUP/CUBE row
  * multiplicity and subtotal arithmetic, pivot cell placement, ntile bucket
  * sizes. (The sf0.01 oracle gate covers the full-table forms; these pin the
  * semantics on data small enough to check by hand.) */
class OlapSpec extends SparkSuite {
  import spark.implicits._

  private val sales = Seq(
    ("a", "x", 1L), ("a", "x", 2L), ("a", "y", 4L), ("b", "x", 8L))

  test("rollup emits per-group, per-prefix, and grand-total rows that add up") {
    val df = sales.toDF("k1", "k2", "v")
    val got = df.rollup("k1", "k2")
      .agg(sum("v").as("s"),
        (grouping(col("k1")) * 2 + grouping(col("k2"))).cast("long").as("gid"))
      .select(coalesce(col("k1"), lit("ALL")), coalesce(col("k2"), lit("ALL")),
        col("gid"), col("s"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "x", 0L, 3L), ("a", "y", 0L, 4L), ("b", "x", 0L, 8L),
      ("a", "ALL", 1L, 7L), ("b", "ALL", 1L, 8L),
      ("ALL", "ALL", 3L, 15L)))
  }

  test("cube adds the k2-only slice rollup lacks") {
    val df = sales.toDF("k1", "k2", "v")
    val got = df.cube("k1", "k2").agg(sum("v").as("s"))
      .where(col("k1").isNull && col("k2").isNotNull)
      .select(col("k2"), col("s")).as[(String, Long)].collect().toSet
    assert(got == Set(("x", 11L), ("y", 4L)))
  }

  test("pivot with explicit values places counts and zero-fills absent cells") {
    val df = sales.toDF("k1", "k2", "v")
    val got = df.groupBy("k1").pivot("k2", Seq("x", "y", "z"))
      .agg(count(lit(1))).na.fill(0L, Seq("x", "y", "z"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 1L, 0L), ("b", 1L, 0L, 0L)))
  }

  test("ntile splits 10 rows into 4,3,3 and is deterministic on the total order") {
    val df = (1 to 10).map(i => (1, i)).toDF("k", "v")
    val got = df.select(col("v"),
        ntile(3).over(org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("v")).as("b"))
      .as[(Int, Int)].collect().toMap
    assert((1 to 4).forall(got(_) == 1))
    assert((5 to 7).forall(got(_) == 2))
    assert((8 to 10).forall(got(_) == 3))
  }
}
