package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Mini domain fixtures mirroring the reference's source schemas
  * (FIXTURES.md §1): books with CJK titles incl. edition-noise duplicates,
  * a tag dimension, per-book tag counts covering the min==max bucket edge,
  * user collections, page-view log lines (incl. malformed), and pub/sub
  * event frames (incl. ack frames and invalid ids). */
object Fixtures {

  def books(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "活着", "余华", 9.1),
      (2L, "活着（精装）", "余华", 8.9),          // edition dup of 1
      (3L, "三体", "刘慈欣", 9.3),
      (4L, "三体2 黑暗森林", "刘慈欣", 9.2),      // normalizes to 三体
      (5L, "百年孤独", "马尔克斯, 加西亚", 9.0),  // multi-author
      (6L, "围城", "钱锺书", 8.8),
      (7L, "战争与和平", "托尔斯泰", 9.4),
      (8L, "小王子", "圣埃克苏佩里", 9.0)
    ).toDF("id", "title", "author", "rating")
      .union(Seq(
        (9L, null.asInstanceOf[String], "某人", 5.0),   // dropped: null title
        (10L, "无名", null.asInstanceOf[String], 5.0)   // dropped: null author
      ).toDF("id", "title", "author", "rating"))
  }

  def tags(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, "科幻"), (2L, "文学"), (3L, "经典"), (4L, "小说"), (5L, "历史"))
      .toDF("id", "tag")
  }

  /** book 1 exercises buckets 1/2/4; book 3 the min==max ⇒ 4 edge. */
  def bookTags(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 2L, 4), (1L, 3L, 2), (1L, 4L, 1),
      (2L, 2L, 3), (2L, 3L, 2), (2L, 4L, 1),
      (3L, 1L, 5),
      (4L, 1L, 4), (4L, 4L, 1),
      (5L, 2L, 3), (5L, 3L, 3),
      (6L, 2L, 2), (6L, 4L, 2),
      (7L, 5L, 4), (7L, 3L, 1),
      (8L, 2L, 1), (8L, 4L, 3)
    ).toDF("bookId", "tagId", "num")
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Users 101-104 collect >2 books; 105 only one; some isCollect=0 rows. */
  def collects(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (101L, 1L, 1, ts("2017-03-01 10:00:00")),
      (101L, 3L, 1, ts("2017-03-01 11:00:00")),
      (101L, 5L, 1, ts("2017-03-01 12:00:00")),
      (101L, 7L, 1, ts("2017-03-01 13:00:00")),
      (102L, 3L, 1, ts("2017-03-02 10:00:00")),
      (102L, 4L, 1, ts("2017-03-02 11:00:00")),
      (102L, 8L, 1, ts("2017-03-02 12:00:00")),
      (103L, 5L, 1, ts("2017-03-01 09:00:00")),
      (103L, 6L, 1, ts("2017-03-01 09:30:00")),
      (103L, 7L, 1, ts("2017-03-01 09:45:00")),
      (104L, 1L, 1, ts("2017-03-03 08:00:00")),
      (104L, 2L, 1, ts("2017-03-03 08:10:00")),
      (104L, 6L, 1, ts("2017-03-03 08:20:00")),
      (104L, 8L, 1, ts("2017-03-03 08:30:00")),
      (105L, 1L, 1, ts("2017-03-01 08:00:00")),
      (105L, 3L, 0, ts("2017-03-01 08:05:00"))   // un-collected: excluded
    ).toDF("userId", "bookId", "isCollect", "time")
  }

  /** Raw log rows as (userId, bookId) views. */
  def logViews(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (101L, 3L), (101L, 5L), (101L, 5L),
      (106L, 1L), (106L, 4L), (106L, 7L),
      (107L, 2L), (107L, 6L)
    ).toDF("userId", "bookId")
  }

  /** Pub/sub frames: valid u_like, valid first-select, ack frame, invalid
    * id, malformed JSON. */
  val eventFrames: Seq[String] = Seq(
    """{"userId": 101}""",
    """{"userId": 106, "bookIds": [3, 7]}""",
    "1",
    """{"userId": -5}""",
    "not json at all")
}
