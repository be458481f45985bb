package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

/** Snapshot diff on hand-traced versions, including null compare cells. */
class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  private def v1 = Seq(
    (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, Some("c"), 30),
    (4L, None: Option[String], 40), (5L, Some("e"), 50)
  ).toDF("id", "txt", "score")

  private def v2 = Seq(
    (1L, Some("a"), 10),                 // unchanged
    (2L, Some("B"), 20),                 // changed (txt)
    (3L, Some("c"), 31),                 // changed (score)
    (4L, None: Option[String], 40),      // unchanged (null <=> null)
    (6L, Some("f"), 60)                  // added; 5 removed
  ).toDF("id", "txt", "score")

  test("classifies added/removed/changed/unchanged with null-safe compare") {
    val got = SnapshotDiff.diff(v1, v2, "id", Seq("txt", "score"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "unchanged", 5L -> "removed", 6L -> "added"))
  }

  test("null-to-value transitions count as changed, not unchanged") {
    val a = Seq((1L, Option.empty[String])).toDF("id", "txt")
    val b = Seq((1L, Option("x"))).toDF("id", "txt")
    val got = SnapshotDiff.diff(a, b, "id", Seq("txt"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed"))
  }

  test("diffCounts rolls up to one row per present status") {
    val got = SnapshotDiff.diffCounts(v1, v2, "id", Seq("txt", "score"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("unchanged" -> 2L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("extra columns outside compareCols never affect the verdict") {
    val a = Seq((1L, "a", "junk1")).toDF("id", "txt", "noise")
    val b = Seq((1L, "a", "junk2")).toDF("id", "txt", "noise")
    val got = SnapshotDiff.diff(a, b, "id", Seq("txt"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged"))
  }
}
