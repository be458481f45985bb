package graft

import graft.io.InMemoryKV
import graft.jobs.SimilarBooksJob

/** Committed end-to-end goldens (SURVEY §5.3): the exact KV contents of the
  * similar-books pipeline on the domain fixtures. Everything is seeded, so
  * these are equality checks, not invariant checks.
  *
  * Two configurations are pinned:
  *  - reference parity (df pruning OFF — the reference's simility_books.py
  *    vectorizes the full vocabulary), hand-verified:
  *     - book 2 (活着（精装）) never appears in book 1's list and vice
  *       versa, and 3/4 (三体 / 三体2) likewise collapse — F7 edition dedup;
  *     - book 3 has NO key at all: its only candidate (4) normalizes to its
  *       own title, so the deduped list is empty;
  *     - every list is rating-descending with id tie-break (W4):
  *       e.g. 1 → 7(9.4), 4(9.2), 5(9.0), 8(9.0), 6(8.8).
  *  - the job's DEFAULT (maxDfFraction = 0.5, the scale-safe stop-word
  *    prune): the 8-doc fixture's df cap is floor(8 * 0.5) = 4, so 文学
  *    and 小说 (each in 5 docs) are pruned from pair generation while
  *    经典 (df 4) survives. The surviving pairs are exactly the ones
  *    sharing 经典 — {1, 2, 5, 7} interlinked — minus the 1↔2 edition
  *    dedup; 3/4 share only 科幻 but collapse under title dedup, and
  *    6/8's entire overlap was pruned terms. Aggressive at toy scale by
  *    construction; at corpus scale 0.5 prunes only true stop-words (and
  *    keeps the join non-quadratic).
  */
class SimilarBooksGoldenSpec extends SparkSuite {

  test("E2E golden: exact KV snapshot, reference parity (pruning off)") {
    InMemoryKV.clear()
    SimilarBooksJob.run(Fixtures.books(spark), Fixtures.tags(spark),
      Fixtures.bookTags(spark), new InMemoryKV, topK = 100, store = 15,
      maxDfFraction = 0.0)
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

  test("E2E golden: exact KV snapshot, default hot-term pruning on") {
    InMemoryKV.clear()
    SimilarBooksJob.run(Fixtures.books(spark), Fixtures.tags(spark),
      Fixtures.bookTags(spark), new InMemoryKV, topK = 100, store = 15)
    val expected = Map(
      "b_similar:1" -> "7,5",
      "b_similar:2" -> "7,5",
      "b_similar:5" -> "7,2",
      "b_similar:7" -> "5,2")
    assert(InMemoryKV.snapshot == expected)
  }
}
