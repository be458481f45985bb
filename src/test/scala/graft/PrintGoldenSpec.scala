package graft

import graft.io.InMemoryKV
import graft.jobs.SimilarBooksJob

/** Committed end-to-end golden (SURVEY §5.3): the exact KV contents of the
  * similar-books pipeline on the domain fixtures. Everything is seeded, so
  * this is an equality check, not an invariant check. Hand-verified:
  *  - book 2 (活着（精装）) never appears in book 1's list and vice versa,
  *    and 3/4 (三体 / 三体2) likewise collapse — F7 edition dedup;
  *  - book 3 has NO key at all: its only candidate (4) normalizes to its
  *    own title, so the deduped list is empty;
  *  - every list is rating-descending with id tie-break (W4):
  *    e.g. 1 → 7(9.4), 4(9.2), 5(9.0), 8(9.0), 6(8.8).
  */
class SimilarBooksGoldenSpec extends SparkSuite {

  test("E2E golden: exact KV snapshot of the similar-books pipeline") {
    InMemoryKV.clear()
    SimilarBooksJob.run(Fixtures.books(spark), Fixtures.tags(spark),
      Fixtures.bookTags(spark), new InMemoryKV, topK = 100, store = 15)
    val expected = Map(
      "b_similar:1" -> "7,4,5,8,6",
      "b_similar:2" -> "7,4,5,8,6",
      "b_similar:4" -> "1,8,6",
      "b_similar:5" -> "7,8,2,6",
      "b_similar:6" -> "4,1,5,8",
      "b_similar:7" -> "5,2",
      "b_similar:8" -> "4,1,5,6")
    assert(InMemoryKV.snapshot == expected)
  }
}
