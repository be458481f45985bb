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
}
