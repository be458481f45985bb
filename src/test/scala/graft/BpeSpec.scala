package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import graft.expressions.BpeTokenize

/** BPE application semantics against hand-traced merges: priority order
  * decides which pair merges first, unknown pairs never merge, words are
  * independent. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def bpe(c: org.apache.spark.sql.Column,
                  merges: Seq[(String, String)]) =
    column(BpeTokenize(expression(c), merges))

  test("merges apply in rank order; leftmost lowest-rank pair first") {
    // merges: (l,o)→lo rank0, (lo,w)→low rank1, (e,r)→er rank2
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val got = Seq("lower low")
      .toDF("t").select(bpe(col("t"), merges).as("toks"))
      .as[Seq[String]].head()
    // "lower": l o w e r → lo w e r → low e r → low er
    // "low":   l o w → lo w → low
    assert(got == Seq("low", "er", "low"))
  }

  test("no applicable merge leaves single characters; empty text yields no tokens") {
    val got = Seq("ab", "")
      .toDF("t").select(bpe(col("t"), Seq(("x", "y"))).as("toks"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a", "b"))
    assert(got(1) == Seq.empty)
  }

  test("earlier rank wins over a later rank even when both match") {
    // "abc": with (b,c) rank0 and (a,b) rank1 → a + bc, NOT ab + c
    val got = Seq("abc")
      .toDF("t").select(bpe(col("t"), Seq(("b", "c"), ("a", "b"))).as("toks"))
      .as[Seq[String]].head()
    assert(got == Seq("a", "bc"))
  }

  test("duplicate pair in the merge table keeps its FIRST (highest-priority) rank") {
    // ("a","b") appears at rank 0 and again at rank 2; last-wins ranking
    // would demote it below ("b","c") and produce a+bc instead of ab+c
    val got = Seq("abc")
      .toDF("t")
      .select(bpe(col("t"), Seq(("a", "b"), ("b", "c"), ("a", "b"))).as("toks"))
      .as[Seq[String]].head()
    assert(got == Seq("ab", "c"))
  }

  test("learned merges compress repeated corpus patterns end-to-end") {
    // a tiny "learned" table: common English digraphs chained to words
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
      ("an", "d"), ("in", "g"))
    val docs = Seq("the man and the ring sing thing").toDF("t")
    val toks = docs.select(explode(bpe(col("t"), merges)).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    assert(toks("the") == 2L)     // full word merged via th→the
    assert(toks("and") == 1L)     // an→and
    assert(toks("ing") == 3L)     // in+g in ring/sing/thing
  }
}
