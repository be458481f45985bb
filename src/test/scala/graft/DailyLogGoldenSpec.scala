package graft

import graft.io.InMemoryKV
import graft.jobs._

/** Committed E2E golden for the daily-log pipeline (SURVEY §5.3) — exact
  * KV contents on the fixtures with every seed fixed. Hand-checked:
  *  - each user's recommendations exclude their own log-viewed books
  *    (101 viewed 3,5; 106 viewed 1,4,7; 107 viewed 2,6) — the LOG
  *    pipeline filters log-seen books, not the collect table
  *    (log_analyze.py:174-181 semantics);
  *  - u_similar lists contain only model (collection) users. */
class DailyLogGoldenSpec extends SparkSuite {

  test("E2E golden: exact KV snapshot of the daily-log pipeline") {
    InMemoryKV.clear()
    val fitted = RecommenderModel.fit(
      Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
      Fixtures.collects(spark),
      minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)
    DailyLogJob.run(Fixtures.logViews(spark), fitted, new InMemoryKV)
    val expected = Map(
      "b_like:101" -> "6,7,1",
      "b_like:106" -> "5,3",
      "b_like:107" -> "7,1,5,3",
      "u_similar:101" -> "103,102",
      "u_similar:106" -> "101,103,102",
      "u_similar:107" -> "103,101,102")
    assert(InMemoryKV.snapshot == expected)
  }
}
