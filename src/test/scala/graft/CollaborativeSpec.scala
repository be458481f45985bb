package graft

import graft.model.Collaborative
import org.apache.spark.sql.functions._

/** ALS module: deterministic fit (seeded), sane top-k serving. */
class CollaborativeSpec extends SparkSuite {
  import spark.implicits._

  test("implicit ALS recommends collected-adjacent items, deterministically") {
    val interactions = Collaborative.interactionsFromCollect(Fixtures.collects(spark))
    val fitted = Collaborative.fit(interactions, rank = 4, maxIter = 5)
    val users = interactions.select("user").distinct()
    val recs = Collaborative.recommendForUsers(fitted, users, k = 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(recs.keySet == Set(101L, 102L, 103L, 104L, 105L))
    assert(recs.values.forall(items => items.size <= 3 && items.distinct == items))
    // seeded: second fit gives identical lists
    val recs2 = Collaborative.recommendForUsers(
        Collaborative.fit(interactions, rank = 4, maxIter = 5), users, 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(recs == recs2)
  }

  test("fromFactors reconstructs the serving surface from pinned factors") {
    val interactions = Collaborative.interactionsFromCollect(Fixtures.collects(spark))
    val fitted = Collaborative.fit(interactions, rank = 4, maxIter = 5)
    val users = interactions.select("user").distinct()
    val direct = Collaborative.recommendForUsers(fitted, users, k = 3)
      .as[(Long, Seq[Long])].collect().toMap
    // the offline-refit / online-serve split: persist ONLY the factor
    // tables, rebuild the model with no fit, serve identically
    val rebuilt = Collaborative.fromFactors(4,
      fitted.model.userFactors, fitted.model.itemFactors)
    val replayed = Collaborative.recommendForUsers(rebuilt, users, k = 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(replayed == direct)
  }

  test("fromFactors fails loudly on Int-overflow ids and wrong-rank features") {
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val good = Seq((1L, Seq(0.1f, 0.2f, 0.3f, 0.4f)))
      .toDF("id", "features")
    // an id past Int.MaxValue would silently WRAP under a bare cast,
    // merging two users' factors — the load path must raise instead
    val overflow = Seq((4294967297L, Seq(0.1f, 0.2f, 0.3f, 0.4f)))
      .toDF("id", "features")
    val e1 = intercept[Throwable] {
      Collaborative.fromFactors(4, overflow, good)
        .model.userFactors.collect()
    }
    assert(messages(e1).contains("overflows Int"), messages(e1))
    // a wrong-length features array would misalign the blocked dot
    // products for every row after it — raise, don't serve garbage
    val shortFeat = Seq((2L, Seq(0.1f, 0.2f, 0.3f))).toDF("id", "features")
    val e2 = intercept[Throwable] {
      Collaborative.fromFactors(4, good, shortFeat)
        .model.itemFactors.collect()
    }
    assert(messages(e2).contains("features length != rank"), messages(e2))
  }

  test("solveUserFactors reproduces MLlib's final explicit half-step to float rounding") {
    // EXPLICIT-feedback fit: the alternation ends on the user side, so
    // the converged model's userFactors ARE one normal-equations solve
    // against its final itemFactors — our distributed closed-form
    // half-step must reproduce them (this is the fit-numerics value
    // check ml2 could not give: MLlib's own output is the oracle)
    val interactions = Collaborative.interactionsFromCollect(Fixtures.collects(spark))
      .select(col("user").cast("int").as("user"),
        col("item").cast("int").as("item"),
        col("rating").cast("float").as("rating"))
    val als = new org.apache.spark.ml.recommendation.ALS()
      .setRank(4).setMaxIter(5).setRegParam(0.1).setSeed(42L)
      .setImplicitPrefs(false)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
    val model = als.fit(interactions)
    val mllib = model.userFactors
      .as[(Int, Seq[Float])].collect().toMap
    val ours = Collaborative.solveUserFactors(
        interactions, model.itemFactors, rank = 4, regParam = 0.1)
      .as[(Long, Seq[Double])].collect().toMap
    assert(ours.keySet == mllib.keySet.map(_.toLong))
    for ((u, fs) <- mllib; (m, o) <- fs.zip(ours(u.toLong))) {
      assert(math.abs(m - o) <= 1e-4 * math.max(1.0, math.abs(m)),
        s"user $u: MLlib $fs vs half-step ${ours(u.toLong)}")
    }
  }

  test("solveUserFactors solves the system it was given (residual check, rank 4)") {
    // independent of MLlib: for every user, A·x must equal b where
    // A = Σ y·yᵀ + λI and b = Σ r·y assembled by hand from the inputs
    val items = Seq(
      (1L, Seq(1.0f, 0.5f, -0.25f, 0.125f)),
      (2L, Seq(0.5f, -1.0f, 0.75f, 0.25f)),
      (3L, Seq(-0.125f, 0.25f, 1.0f, -0.5f)),
      (4L, Seq(0.25f, 0.125f, -0.5f, 1.0f))).toDF("id", "features")
    val inter = Seq(
      (10L, 1L, 2.0), (10L, 2L, 1.0), (10L, 3L, 4.0),
      (11L, 2L, 3.0), (11L, 4L, 5.0)).toDF("user", "item", "rating")
    val lam = 0.5
    val x = Collaborative.solveUserFactors(inter, items, rank = 4,
        regParam = lam, regByRatingCount = true)
      .as[(Long, Seq[Double])].collect().toMap
    val y = Map(1L -> Array(1.0, 0.5, -0.25, 0.125),
      2L -> Array(0.5, -1.0, 0.75, 0.25),
      3L -> Array(-0.125, 0.25, 1.0, -0.5),
      4L -> Array(0.25, 0.125, -0.5, 1.0))
    val byUser = Map(
      10L -> Seq((1L, 2.0), (2L, 1.0), (3L, 4.0)),
      11L -> Seq((2L, 3.0), (4L, 5.0)))
    for ((u, rows) <- byUser) {
      val a = Array.ofDim[Double](4, 4)
      val b = new Array[Double](4)
      for ((it, r) <- rows; i <- 0 until 4) {
        b(i) += r * y(it)(i)
        for (j <- 0 until 4) a(i)(j) += y(it)(i) * y(it)(j)
      }
      for (i <- 0 until 4) a(i)(i) += lam * rows.size
      val xu = x(u)
      for (i <- 0 until 4) {
        val ax = (0 until 4).map(j => a(i)(j) * xu(j)).sum
        assert(math.abs(ax - b(i)) <= 1e-9,
          s"user $u row $i: A·x=$ax but b=${b(i)}")
      }
    }
  }

  test("solveUserFactors fails loudly on rank-mismatched item factors") {
    // rank-2 factors solved "at rank 4" would silently truncate/null-pad
    // through element_at into plausible-but-wrong user factors — the
    // in-plan guard must raise instead (same contract as fromFactors)
    val items = Seq((1L, Seq(1.0f, 0.5f))).toDF("id", "features")
    val inter = Seq((10L, 1L, 2.0)).toDF("user", "item", "rating")
    val e = intercept[Exception] {
      Collaborative.solveUserFactors(inter, items, rank = 4, regParam = 0.5)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("features length != rank 4")),
      s"expected the loud rank guard, got: ${messages(e).mkString(" | ")}")
  }
}
