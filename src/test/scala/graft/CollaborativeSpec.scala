package graft

import graft.model.Collaborative

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
}
