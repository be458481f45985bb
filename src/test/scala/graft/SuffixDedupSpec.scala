package graft

import graft.operators.SuffixDedup

/** Prefix-doubling duplicated-region detection: hand-traced spans, an
  * internal-repetition case, and a full cross-check against an
  * independent brute-force gram implementation. */
class SuffixDedupSpec extends SparkSuite {
  import spark.implicits._

  // character sequences with no internal repeats and no cross-matches:
  // shared/X use disjoint orderings (ascending vs descending ASCII runs)
  private val shared = (40 until 110).map(_.toChar).mkString          // 70 chars
  private val xBlock = (112 until 32 by -1).map(_.toChar).mkString    // 80 chars

  test("cross-doc shared span is found with exact offsets and length") {
    val docs = Seq(
      (1L, ("A" * 10) + shared + ("B" * 10)),
      (2L, ("C" * 5) + shared + ("D" * 20))
    ).toDF("id", "text")
    val got = SuffixDedup.duplicatedRegions(docs, "id", "text", 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 70L), (2L, 5L, 70L)))
  }

  test("internal repetition X+X yields both copies' regions") {
    val docs = Seq((3L, xBlock + xBlock)).toDF("id", "text")
    val got = SuffixDedup.duplicatedRegions(docs, "id", "text", 64)
      .as[(Long, Long, Long)].collect().toSet
    // windows 0..16 (dup of 80..96) and 80..96 (dup of 0..16)
    assert(got == Set((3L, 0L, 80L), (3L, 80L, 80L)))
  }

  test("spans shorter than minLength are invisible") {
    val short = shared.take(63)
    val docs = Seq((1L, short + ("A" * 30)), (2L, short + ("B" * 30)))
      .toDF("id", "text")
    assert(SuffixDedup.duplicatedRegions(docs, "id", "text", 64).count() == 0)
  }

  test("removeRegions splices spans out; full coverage empties the doc") {
    val docs = Seq(
      (1L, ("A" * 10) + shared + ("B" * 10)),
      (2L, ("C" * 5) + shared + ("D" * 20)),
      (3L, xBlock + xBlock),
      (4L, "untouched short doc")
    ).toDF("id", "text")
    val regions = SuffixDedup.duplicatedRegions(docs, "id", "text", 64)
    val got = SuffixDedup.removeRegions(docs, regions, "id", "text")
      .select("id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) == ("A" * 10) + ("B" * 10))
    assert(got(2L) == ("C" * 5) + ("D" * 20))
    assert(got(3L) == "", "fully duplicated doc must come back empty")
    assert(got(4L) == "untouched short doc")
  }

  test("removeRegions fails fast on overlapping regions instead of splicing garbage") {
    val docs = Seq((1L, "x" * 100)).toDF("id", "text")
    val overlapping = Seq((1L, 0L, 50L), (1L, 30L, 50L))
      .toDF("id", "start", "region_len")
    val ex = intercept[Exception] {
      SuffixDedup.removeRegions(docs, overlapping, "id", "text").collect()
    }
    assert(ex.getMessage.contains("overlapping") ||
      Option(ex.getCause).exists(_.getMessage.contains("overlapping")))
  }

  test("matches an independent brute-force gram implementation") {
    val rnd = new scala.util.Random(42)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    // random 4-letter texts + one implanted 40-char shared block
    val block = randText(40)
    val corpus = (0 until 6).map { i =>
      val base = randText(150)
      val t = if (i % 2 == 0) base.substring(0, 60) + block + base.substring(100)
              else base
      (i.toLong, t)
    }
    val L = 16   // small enough that random 4-letter collisions also occur
    // brute force: mark offsets whose L-gram occurs >= 2 times, collapse runs
    val grams = corpus.flatMap { case (id, t) =>
      (0 to t.length - L).map(off => (t.substring(off, off + L), id, off))
    }
    val dupGrams = grams.groupBy(_._1).filter(_._2.size >= 2).values.flatten
    val expected = dupGrams.toSeq.map(g => (g._2, g._3)).groupBy(_._1)
      .flatMap { case (id, offs) =>
        val sorted = offs.map(_._2).sorted
        // collapse consecutive offsets into maximal runs
        sorted.foldLeft(List.empty[(Long, Long, Long)]) {
          case (acc, off) => acc match {
            case (d, start, len) :: tail
                if d == id && start + len - L + 1 == off =>
              (d, start, off - start + L) :: tail
            case _ => (id, off.toLong, L.toLong) :: acc
          }
        }
      }.toSet
    val got = SuffixDedup.duplicatedRegions(
        corpus.toDF("id", "text"), "id", "text", L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected, s"got $got\nexpected $expected")
  }
}
