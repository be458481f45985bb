package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.io.InMemoryKV
import graft.jobs._
import graft.prep.{Collections, TagWeighting}

/** End-to-end pipeline tests over the domain fixtures (SURVEY §5.3-5.5):
  * the three reference entry points run green with seeded determinism, and
  * the reference's output invariants hold (no self-recommendation, no
  * edition duplicates, caps respected, collected books never recommended,
  * fallback = hot list). */
class SimilarBooksJobSpec extends SparkSuite {
  import spark.implicits._

  test("3.1 similar-books: dedup, self-exclusion, rating order, KV written") {
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val res = SimilarBooksJob.run(
      Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
      kv, topK = 100, store = 15)
    val ranked = res.ranked.collect()
    assert(ranked.nonEmpty)
    // no self pairs, no b whose normalized title equals a's
    val pairs = res.ranked.select("a", "b").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a != b })
    // book 1 (活着) must never list book 2 (活着（精装）) and vice versa
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 1L)))
    assert(!pairs.contains((3L, 4L)) && !pairs.contains((4L, 3L)))
    // within each a, positions are rating-descending
    val byA = ranked.groupBy(_.getAs[Long]("a"))
    byA.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("pos"))
      val ratings = sorted.map(_.getAs[Double]("rating"))
      assert(ratings.zip(ratings.tail).forall { case (x, y) => x >= y })
    }
    // KV keys present with comma-joined ids
    val snap = InMemoryKV.snapshot
    assert(snap.keys.exists(_.startsWith("b_similar:")))
    assert(snap.values.forall(_.matches("[0-9]+(,[0-9]+)*")))
    // dropped-null books (9, 10) never appear
    assert(pairs.forall { case (a, b) => a < 9 && b < 9 })
  }
}

class DailyLogJobSpec extends SparkSuite {
  import spark.implicits._

  private def fitted = RecommenderModel.fit(
    Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
    Fixtures.collects(spark),
    minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)

  test("3.3 daily-log: set-oriented recs for all log users, invariants hold") {
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val recs = DailyLogJob.run(Fixtures.logViews(spark), fitted, kv)
    val books = recs.books.collect()
    assert(books.length == 3)   // users 101, 106, 107
    // never recommend a book the user already viewed (own-books filter)
    val own = Map(101L -> Set(3L, 5L), 106L -> Set(1L, 4L, 7L), 107L -> Set(2L, 6L))
    books.foreach { r =>
      val u = r.getAs[Long]("query")
      val rec = r.getAs[scala.collection.Seq[Long]]("books")
      assert(rec.toSet.intersect(own(u)).isEmpty, s"user $u got own books")
      assert(rec.size <= 15)
      assert(rec.distinct == rec)
    }
    val snap = InMemoryKV.snapshot
    assert(snap.keys.count(_.startsWith("b_like:")) == 3)
    assert(snap.keys.count(_.startsWith("u_similar:")) >= 1)
  }

  test("ST4: fitted model round-trips through save/load with equal recs") {
    InMemoryKV.clear()
    val kv = new InMemoryKV
    DailyLogJob.run(Fixtures.logViews(spark), fitted, kv)
    val direct = InMemoryKV.snapshot
    val dir = java.nio.file.Files.createTempDirectory("fitted").toString
    RecommenderModel.save(fitted, dir)
    val reloaded = RecommenderModel.load(spark, dir)
    InMemoryKV.clear()
    DailyLogJob.run(Fixtures.logViews(spark), reloaded, kv)
    assert(InMemoryKV.snapshot == direct)
  }

  test("deterministic across runs (seeded randomness only)") {
    InMemoryKV.clear()
    val kv = new InMemoryKV
    DailyLogJob.run(Fixtures.logViews(spark), fitted, kv)
    val first = InMemoryKV.snapshot
    InMemoryKV.clear()
    DailyLogJob.run(Fixtures.logViews(spark), fitted, kv)
    assert(InMemoryKV.snapshot == first)
  }
}

class ServeJobSpec extends SparkSuite {
  import spark.implicits._

  test("3.2 streaming serve: decode filters acks/invalid, recs written per event") {
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val fitted = RecommenderModel.fit(
      Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
      Fixtures.collects(spark),
      minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    stream.addData(Fixtures.eventFrames: _*)
    val q = ServeJob.start(stream.toDF(), fitted, Fixtures.collects(spark), kv)
    q.processAllAvailable()
    q.stop()
    val snap = InMemoryKV.snapshot
    // user 101 (valid, has collections) and 106 (first-select payload)
    // get recs; ack frame, -5, and garbage are dropped
    assert(snap.contains("b_like:101"), s"snapshot was: $snap")
    assert(snap.contains("b_like:106"))
    assert(!snap.keys.exists(_.contains("-5")))
    // u_like semantics: 101's recommendations exclude collected books 1,3,5,7
    val recs101 = snap("b_like:101").split(",").map(_.toLong).toSet
    assert(recs101.intersect(Set(1L, 3L, 5L, 7L)).isEmpty)
  }

  test("u_first_select: payload books drive recs, collected filter off") {
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val fitted = RecommenderModel.fit(
      Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
      Fixtures.collects(spark),
      minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    // user 101 HAS collections (1,3,5,7) but first-select scores from the
    // payload and does NOT filter collected books
    stream.addData("""{"userId": 101, "bookIds": [6]}""")
    val q = ServeJob.uFirstSelect(stream.toDF(), fitted, Fixtures.collects(spark), kv)
    q.processAllAvailable()
    q.stop()
    assert(InMemoryKV.snapshot.contains("b_like:101"))
  }

  test("ST6: event user with no context falls back to the hot list") {
    InMemoryKV.clear()
    val kv = new InMemoryKV
    val fitted = RecommenderModel.fit(
      Fixtures.books(spark), Fixtures.tags(spark), Fixtures.bookTags(spark),
      Fixtures.collects(spark),
      minCollected = 2, minDf = 1.0, stopWords = Nil, k = 2, hotN = 3)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    stream.addData("""{"userId": 777}""")   // unknown user, no collections
    val q = ServeJob.start(stream.toDF(), fitted, Fixtures.collects(spark), kv)
    q.processAllAvailable()
    q.stop()
    val snap = InMemoryKV.snapshot
    val hotIds = fitted.hot.orderBy(col("cnt").desc, col("bookId").asc)
      .select("bookId").as[Long].collect().toSeq
    assert(snap("b_like:777") == hotIds.mkString(","))
    // ST6 also covers u_similar: the default similar-user ids are emitted
    assert(snap("u_similar:777") == Recommender.Params().defaultUsers.mkString(","))
  }
}
