package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Prefix filtering must be a pure COST optimization: the exact result set
  * of the plain all-pairs operator, at every threshold — completeness rides
  * on the pigeonhole lemma, and any off-by-one in the prefix length loses
  * real pairs silently. Checked on the full sf0.001 corpus and on
  * adversarial fixtures (near-identical docs, singleton-shingle docs). */
class PrefixJoinSpec extends SparkSuite {
  import spark.implicits._

  private def resultSet(df: org.apache.spark.sql.DataFrame) = df
    .select(col("a"), col("b"), round(col("jaccard"), 9).as("j"))
    .as[(Long, Long, Double)].collect().toSet

  test("equals the plain all-pairs operator on the sf0.001 corpus, t=0.6 and t=0.9") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.6, 0.9)) {
      val plain = resultSet(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = t))
      val prefix = resultSet(
        Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, minJaccard = t))
      assert(prefix == plain, s"t=$t: prefix filtering changed the result set")
      assert(plain.nonEmpty, s"t=$t: fixture must actually produce pairs")
    }
  }

  test("adversarial: identical docs (J=1) and t=1.0 prefix length 1 still match") {
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd"), (2L, "aaaa bbbb cccc dddd"),
      (3L, "aaaa bbbb cccc eeee"), (4L, "zz")
    ).toDF("doc_id", "text")
    val got = resultSet(
      Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, minJaccard = 1.0))
    assert(got.map(r => (r._1, r._2)) == Set((1L, 2L)))
    assert(got.head._3 == 1.0)
  }

  test("fp boundary: t*sz integral but double-overshooting must not drop J==t pairs") {
    // Char-3-grams: A="abcdefa" → {abc,bcd,cde,def,efa} (5), B="abcdef" →
    // {abc,bcd,cde,def} (4) ⊂ A, so J = 4/5 = t exactly at t=0.8. In
    // doubles 0.8*5 = 4.000000000000000222: an un-clamped ceil makes A's
    // prefix one shingle short (1 instead of 2) AND the length filter
    // rejects szb=4 >= 0.8*5. A's only exclusive gram "efa" has dfreq 1,
    // so it is the single prefix shingle under the buggy length — every
    // shared gram sits in the suffix and the pair vanishes silently.
    val docs = Seq(
      (1L, "abcdefa"),
      (2L, "abcdef")
    ).toDF("doc_id", "text")
    for (op <- Seq(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.8),
        Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, minJaccard = 0.8))) {
      assert(resultSet(op) == Set((1L, 2L, 0.8)),
        "boundary pair at J exactly t must survive")
    }
  }

  test("equals the plain operator at thresholds with inexact double products") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.55, 0.8)) {
      val plain = resultSet(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = t))
      val prefix = resultSet(
        Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, minJaccard = t))
      assert(prefix == plain, s"t=$t: prefix filtering changed the result set")
    }
  }

  test("positional filter: identical result set, strictly fewer candidates") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.6, 0.8)) {
      val plain = resultSet(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = t))
      val pos = resultSet(Dedup.ngramJaccardPairsPrefix(
        docs, "doc_id", "text", n = 3, minJaccard = t, positionalFilter = true))
      assert(pos == plain, s"t=$t: positional filter changed the result set")
    }
    // candidate volume: the positional upper bound must prune pairs the
    // prefix+length stage alone admits (sound pruning: every survivor of
    // the exact join is provably kept — checked by the equality above)
    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val without = Dedup.prefixCandidates(sh, 0.6, positionalFilter = false).count()
    val withPos = Dedup.prefixCandidates(sh, 0.6, positionalFilter = true).count()
    assert(withPos < without,
      s"positional filter should shrink candidates ($withPos vs $without)")
  }

  test("candidate volume: prefixes post strictly fewer shingles than full posting") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val full = sh.select(explode(col("sh"))).count()
    val prefixLen = sh.select(
        (size(col("sh")) - ceil(lit(0.6) * size(col("sh"))) + 1).cast("long"))
      .as[Long].collect().sum
    assert(prefixLen < full / 2,
      s"prefix posting ($prefixLen) should be well under full posting ($full)")
  }
}
