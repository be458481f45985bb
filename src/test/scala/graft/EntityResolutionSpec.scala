package graft

import graft.operators.EntityResolution

/** Entity resolution on hand-traced name variants. */
class EntityResolutionSpec extends SparkSuite {
  import spark.implicits._

  private def records = Seq(
    (1L, "Acme Corp"),
    (2L, "acme  corp"),      // casing + spacing → same normalized form
    (3L, "acme corpx"),      // 1 edit
    (4L, "acme corpxy"),     // 2 edits from base, 1 from corpx (chains)
    (5L, "Beta LLC"),        // singleton
    (6L, "zeta corp")        // shares no block with acme (prefix 'zet')
  ).toDF("id", "name")

  test("variants cluster through chains; canonical is the smallest name") {
    val got = EntityResolution.resolve(records, "id", "name",
        maxDistance = 2, blockPrefixLen = 3)
      .select("id", "entity").as[(Long, String)].collect().toMap
    assert(got(1L) == "acme corp" && got(2L) == "acme corp")
    assert(got(3L) == "acme corp", "1-edit variant must resolve to base")
    assert(got(4L) == "acme corp", "chained variant joins via corpx")
    assert(got(5L) == "beta llc")
    assert(got(6L) == "zeta corp", "different block must stay separate")
  }

  test("maxDistance 0 resolves only exact normalized duplicates") {
    val got = EntityResolution.resolve(records, "id", "name",
        maxDistance = 0, blockPrefixLen = 3)
      .select("id", "entity").as[(Long, String)].collect().toMap
    assert(got(1L) == "acme corp" && got(2L) == "acme corp")
    assert(got(3L) == "acme corpx", "no edits allowed")
  }

  test("all input columns survive alongside the entity") {
    val cols = EntityResolution.resolve(records, "id", "name").columns.toSeq
    assert(cols.contains("id") && cols.contains("name") &&
      cols.contains("entity"))
  }
}
