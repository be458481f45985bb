package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import graft.expressions.BpeTokenize
import graft.model.BpeTrain

/** BPE training traced by hand on the classic Sennrich corpus, plus the
  * train→apply round trip through the SAME expression t13 uses. */
class BpeTrainSpec extends SparkSuite {
  import spark.implicits._

  // low×5, lower×2, newest×6, widest×3 — the worked example from the BPE
  // paper. Hand trace: pair counts give (e,s)=9 tie (s,t)=9 → lex picks
  // (e,s); then (es,t)=9; then (l,o)=7 tie (o,w)=7 → lex picks (l,o);
  // then (lo,w)=7.
  private lazy val corpus = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
  ).toDF("text")

  test("learns the hand-traced merge sequence") {
    val merges = BpeTrain.learn(corpus, "text", numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"got $merges")
  }

  test("learned table round-trips through the apply expression") {
    val merges = BpeTrain.learn(corpus, "text", numMerges = 4)
    val toks = Seq("lowest").toDF("w")
      .select(column(BpeTokenize(expression(col("w")), merges)).as("t"))
      .as[Seq[String]].head()
    // "lowest" was never in the corpus; learned merges still compose it
    assert(toks == Seq("low", "est"), s"got $toks")
  }

  test("stops early when no pair repeats") {
    val merges = BpeTrain.learn(Seq("ab cd").toDF("text"), "text", 10)
    // (a,b) and (c,d) each occur once — below the reuse threshold
    assert(merges.isEmpty, s"got $merges")
  }

  test("is deterministic across runs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = BpeTrain.learn(docs, "text", numMerges = 8)
    val b = BpeTrain.learn(docs, "text", numMerges = 8)
    assert(a == b)
    assert(a.length == 8)
  }
}
