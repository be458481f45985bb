package graft

import org.apache.spark.sql.functions._
import graft.operators.{Skew, TfIdf}

/** Salted operators must be value-exact vs their unsalted equivalents;
  * TF-IDF must match the textbook formula. */
class SkewTfIdfSpec extends SparkSuite {
  import spark.implicits._

  test("saltedSum equals plain groupBy sum on a skewed key distribution") {
    // one hot key (90% of rows) + a long tail
    val rows = (1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 7}", i.toDouble))
    val df = rows.toDF("k", "v")
    val got = Skew.saltedSum(df, Seq("k"), "v", out = "s", salts = 8)
      .as[(String, Double)].collect().toMap
    val exp = df.groupBy("k").agg(sum(col("v")).as("s"))
      .as[(String, Double)].collect().toMap
    assert(got == exp)
  }

  test("saltedSum spreads the hot key across (key, salt) partial groups") {
    val rows = (1 to 512).map(i => ("hot", i.toDouble))
    val df = rows.toDF("k", "v")
    // peek at the partial phase: distinct content-hash salts for the hot
    // key must use most of the salt space (content hashes vary per row)
    val salts = df
      .withColumn("s", pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .select("s").distinct().count()
    assert(salts >= 6, s"hot key used only $salts of 8 salts")
  }

  test("saltedJoin equals plain join (inner, groupBy count)") {
    val fact = (1 to 500).map(i => (i % 5L, i.toLong)).toDF("key", "payload")
    val dim = (0L to 4L).map(k => (k, s"name$k")).toDF("key", "name")
    val got = Skew.saltedJoin(fact, dim, "key", salts = 4)
      .groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val exp = fact.join(dim, "key")
      .groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == exp)
  }

  test("duplicate fact rows spread across salts and still join/sum correctly") {
    // the worst skew case: a hot key whose rows are BIT-IDENTICAL — a
    // content-only salt would put them all on one reducer; the monotonic
    // mix-in must spread them while leaving results exactly unsalted-equal
    val dup = Seq.fill(512)(("hot", 1.0)).toDF("k", "v")
    val used = dup.select(Skew.salt(dup, 8).as("s")).distinct().count()
    assert(used >= 6, s"identical rows used only $used of 8 salts")

    val gotSum = Skew.saltedSum(dup, Seq("k"), "v", out = "s", salts = 8)
      .as[(String, Double)].collect().toMap
    assert(gotSum == Map("hot" -> 512.0))

    val fact = Seq.fill(300)((7L, "same")).toDF("key", "payload")
    val dim = Seq((7L, "name7")).toDF("key", "name")
    val got = Skew.saltedJoin(fact, dim, "key", salts = 4)
    assert(got.count() == 300)
    assert(got.select("name").distinct().as[String].collect().toSeq == Seq("name7"))
  }

  test("tfidf matches the smoothed formula on a hand-checked corpus") {
    // 3 docs; "a" in all 3, "b" in 1 (twice), "c" in 2
    val docs = Seq(
      (1L, Seq("a", "b", "b")),
      (2L, Seq("a", "c")),
      (3L, Seq("a", "c"))).toDF("id", "toks")
    val got = TfIdf.tfidf(docs, "id", "toks")
      .select(col("id"), col("term"), col("tf"), col("tfidf"))
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    def idf(df: Int) = math.log(4.0 / (df + 1.0)) + 1.0
    assert(got((1L, "b"))._1 == 2L)
    assert(math.abs(got((1L, "b"))._2 - 2.0 * idf(1)) < 1e-12)
    assert(math.abs(got((1L, "a"))._2 - 1.0 * idf(3)) < 1e-12)
    assert(math.abs(got((2L, "c"))._2 - 1.0 * idf(2)) < 1e-12)
    // idf of the everywhere-term is ln(4/4)+1 = 1 → tfidf == tf
    assert(math.abs(got((3L, "a"))._2 - 1.0) < 1e-12)
  }
}
