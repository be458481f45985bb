package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.io.EventSource
import graft.prep._

/** Prep-layer specs: tolerant log parsing (S5/S6), cap-sampling (A5),
  * weighted tag docs (A1/A2/F4), document assembly (J2/F5), collections
  * (S3/A6), event decode (K3/K4). */
class LogIngestSpec extends SparkSuite {
  import spark.implicits._

  test("S5/S6: malformed lines and 0-sentinels are dropped, not fatal") {
    val dir = Files.createTempDirectory("graftlog")
    val lines = Seq(
      "101,x,x,x,x,3",          // good
      "101,x,x,x,x,5",          // good
      "abc,x,x,x,x,7",          // bad userId → dropped
      "102,x,x,x,x,0",          // 0 sentinel → dropped
      "102,x,x,x,x,-4",         // negative → dropped
      "103,x,x,x,x,9",          // good
      "garbage line without commas",
      "104,x,x",                // too few columns → bookId null → dropped
      "105,x,x,x,x,notanint")   // bad bookId → dropped
    Files.write(dir.resolve("book.log"), lines.mkString("\n").getBytes)
    val got = LogIngest.parseLog(spark, dir.toString + "/book.log")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((101L, 3L), (101L, 5L), (103L, 9L)))
  }

  test("A5: distinct per user, capped at n with seeded deterministic pick") {
    val views = (1 to 30).map(i => (1L, i.toLong)) ++ Seq((2L, 7L), (2L, 7L))
    val df = views.toDF("userId", "bookId")
    val r1 = LogIngest.userBookSets(df, cap = 20)
      .as[(Long, Seq[Long])].collect().toMap
    assert(r1(1L).size == 20)
    assert(r1(1L).distinct.size == 20)
    assert(r1(2L) == Seq(7L))      // dedup + under cap → kept whole
    val r2 = LogIngest.userBookSets(df, cap = 20)
      .as[(Long, Seq[Long])].collect().toMap
    assert(r1 == r2)               // seeded → stable
  }

  test("F14: dated path layout matches the reference's YYYY/MM/DD scheme") {
    val p = LogIngest.dailyLogPath("/logs", java.time.LocalDate.of(2017, 3, 3))
    assert(p == "/logs/2017/03/03/book.log")
  }
}

class TagWeightingSpec extends SparkSuite {
  import spark.implicits._

  test("A1/A2/F4: weighted doc repeats each tag by its bucket, in tagId order") {
    val got = TagWeighting.weightedTagDocs(
        Fixtures.bookTags(spark), Fixtures.tags(spark))
      .as[(Long, String)].collect().toMap
    // book 1: (tag 文学 num=4 → w4), (经典 2 → w2), (小说 1 → w1)
    assert(got(1L) == "文学 文学 文学 文学 经典 经典 小说")
    // book 3: single tag 科幻 num=5, min==max → w4
    assert(got(3L) == "科幻 科幻 科幻 科幻")
  }
}

class DocumentsSpec extends SparkSuite {
  import spark.implicits._

  test("J2/F5/P2: doc = tags + author + author; null rows dropped") {
    val tagDocs = TagWeighting.weightedTagDocs(
      Fixtures.bookTags(spark), Fixtures.tags(spark))
    val docs = Documents.bookDocs(Fixtures.books(spark), tagDocs)
    val byId = docs.select("bookId", "doc").as[(Long, String)].collect().toMap
    assert(byId(3L) == "科幻 科幻 科幻 科幻 刘慈欣 刘慈欣")
    // multi-author book 5: comma split + space join, doubled
    assert(byId(5L).endsWith("马尔克斯 加西亚 马尔克斯 加西亚"))
    // null title (9) and null author (10) dropped
    assert(!byId.contains(9L) && !byId.contains(10L))
  }
}

class CollectionsSpec extends SparkSuite {
  import spark.implicits._

  test("S3/A4: only collected rows count; HAVING threshold applies") {
    val lists = Collections.userBookLists(Fixtures.collects(spark), minBooks = 2)
      .as[(Long, Seq[Long])].collect().toMap
    assert(lists(101L) == Seq(1L, 3L, 5L, 7L))
    assert(!lists.contains(105L))   // 1 collected + 1 un-collected → below threshold
  }

  test("W5: latest-k by time desc, emitted in recency order") {
    val latest = Collections.latestBooks(Fixtures.collects(spark), k = 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(latest(101L) == Seq(7L, 5L, 3L))   // 13:00, 12:00, 11:00
  }

  test("A6/J3: user doc concatenates member book docs, missing books skipped") {
    val tagDocs = TagWeighting.weightedTagDocs(
      Fixtures.bookTags(spark), Fixtures.tags(spark))
    val bookDocs = Documents.bookDocs(Fixtures.books(spark), tagDocs)
    val userBooks = Seq((1L, Seq(3L, 999L))).toDF("userId", "books")
    val got = Collections.userDocs(userBooks, bookDocs)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "科幻 科幻 科幻 科幻 刘慈欣 刘慈欣")   // 999 skipped
  }
}

class EventSourceSpec extends SparkSuite {
  import spark.implicits._

  test("K3/K4: acks, garbage, and invalid ids dropped; bookIds optional") {
    val got = EventSource.decode(Fixtures.eventFrames.toDF("value"))
      .select("userId", "bookIds").as[(Long, Option[Seq[Long]])].collect().toMap
    assert(got.keySet == Set(101L, 106L))
    assert(got(101L).isEmpty)
    assert(got(106L).contains(Seq(3L, 7L)))
  }
}
