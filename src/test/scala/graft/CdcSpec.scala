package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(19)
  private def randText(n: Int): String =
    (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  test("cdcChunks: chunks partition the text exactly and reassemble it") {
    val docs = (1L to 20L).map(i => (i, randText(200 + rnd.nextInt(400))))
      .toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text", maskBits = 5)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect()
    val texts = docs.as[(Long, String)].collect().toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // contiguous, gap-free cover of [0, len)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3); case _ =>
      }
      assert(sorted.last._3 + sorted.last._4 == texts(id).length)
      // md5s match the substrings they claim to cover
      sorted.foreach { case (_, _, st, ln, h) =>
        val expect = java.security.MessageDigest.getInstance("MD5")
          .digest(texts(id).substring(st.toInt, (st + ln).toInt)
            .getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(h == expect)
      }
    }
  }

  test("cdcChunks: boundaries resynchronize after an insertion " +
    "(the CDC property fixed-width chunking lacks)") {
    val base = randText(3000)
    val edited = "INSERTED-PREFIX-" + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val byDoc = Dedup.cdcChunks(docs, "doc_id", "text", maskBits = 5)
      .select("doc_id", "chunk_md5").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val shared = byDoc(1L).intersect(byDoc(2L)).size
    // the hash window is 64 chars: after at most window + a few chunks the
    // boundaries of the edited doc realign with the original, so almost
    // every original chunk keeps its identity. Fixed-width chunking would
    // share ~0 chunks after a 16-char prefix shift.
    assert(shared >= byDoc(1L).size - 6,
      s"only $shared of ${byDoc(1L).size} chunks survived the edit")
    assert(shared >= byDoc(1L).size * 9 / 10)
  }

  test("cdcChunks: expected chunk length tracks 2^maskBits") {
    val docs = Seq((1L, randText(20000))).toDF("doc_id", "text")
    val n = Dedup.cdcChunks(docs, "doc_id", "text", maskBits = 5).count()
    val mean = 20000.0 / n
    assert(mean > 16 && mean < 64, s"mean chunk length $mean far from 32")
  }
}
