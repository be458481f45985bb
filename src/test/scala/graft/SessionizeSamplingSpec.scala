package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Sessionize}

class SessionizeSamplingSpec extends SparkSuite {
  import spark.implicits._

  test("sessionize: gap splits sessions, ids are 0-based per user") {
    // user 1: events at 0, 10, 100 with gap 50 → sessions {0,10} and {100};
    // user 2: single event → one session
    val ev = Seq((1L, 10L, 0L), (1L, 11L, 10L), (1L, 12L, 100L),
      (2L, 20L, 5L)).toDF("u", "eid", "t")
    val got = Sessionize.sessionize(ev, "u", "t", gap = 50L, tieBreak = col("eid"))
      .select("u", "eid", "session_id").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 10L)) == 0L && got((1L, 11L)) == 0L)
    assert(got((1L, 12L)) == 1L)
    assert(got((2L, 20L)) == 0L)
  }

  test("sessionStats: counts, totals, longest duration") {
    val ev = Seq((1L, 10L, 0L), (1L, 11L, 10L), (1L, 12L, 100L),
      (2L, 20L, 5L)).toDF("u", "eid", "t")
    val got = Sessionize.sessionStats(ev, "u", "t", gap = 50L,
        tieBreak = col("eid"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((2L, 3L, 10L)))   // 2 sessions, 3 events, max dur 10
    assert(got(2L) == ((1L, 1L, 0L)))
  }

  test("sessionize: equal timestamps are ordered by the tiebreak (total order)") {
    val ev = Seq((1L, 2L, 0L), (1L, 1L, 0L), (1L, 3L, 60L)).toDF("u", "eid", "t")
    val a = Sessionize.sessionize(ev, "u", "t", 50L, col("eid"))
      .orderBy("eid").select("session_id").as[Long].collect().toSeq
    assert(a == Seq(0L, 0L, 1L))
  }

  test("hashSplit: exhaustive disjoint cover with stable ~fractions") {
    val ids = (1L to 10000L).toDF("id")
    val split = Sampling.hashSplit(ids, "id", seed = 42L,
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)           // exhaustive, disjoint
    assert(math.abs(counts("train") - 8000L) < 400, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 200, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 200, counts.toString)
  }

  test("contiguousPack: boundary at the token budget, straddlers allowed") {
    import graft.operators.Packing
    // budget 10: docs of 4,4,4 → cum 4,8,12 → packs 0,0,0 (third starts
    // at 8 < 10 and straddles); then 7 → starts at 12 → pack 1
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 7L)).toDF("id", "n")
    val got = Packing.contiguousPack(docs, "n", maxTokens = 10L,
        bucketCol = lit(0), orderCol = col("id"))
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("hashSplit: membership is a pure function of (id, seed)") {
    val ids = (1L to 500L).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.hashSplit(df, "id", 7L, Seq("a" -> 0.5, "b" -> 0.5))
        .select("id", "split").as[(Long, String)].collect().toMap
    val once = assign(ids)
    val again = assign(ids.repartition(13))       // partitioning-independent
    assert(once == again)
    val otherSeed = Sampling.hashSplit(ids, "id", 8L, Seq("a" -> 0.5, "b" -> 0.5))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(once != otherSeed)                     // seed actually matters
  }
}
