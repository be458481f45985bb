package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.TextFunctions

/** Hand-computed expectations for the order- and edge-sensitive operators
  * (SURVEY §5.1): A2 weight buckets incl. min==max, A9 rank-discounted
  * votes, W3 floor semantics, F7 CJK title normalization. */
class WeightingSpec extends SparkSuite {
  import spark.implicits._

  test("A2: min-max buckets match the reference formula incl. min==max edge") {
    val df = Seq(
      (1L, 4.0), (1L, 2.0), (1L, 1.0),  // min=1 max=4
      (3L, 5.0)                          // min==max ⇒ bucket 4
    ).toDF("bookId", "num")
    val got = Weighting.minMaxBucket(df, "bookId", "num")
      .select("bookId", "num", "bucket").as[(Long, Double, Long)]
      .collect().toSet
    // ceil((4+0.1-1)*4/(4+0.1-1)) = 4; ceil((2.1-... )):
    // (2+0.1-1)*4/3.1 = 4.4/3.1 = 1.419 → 2; (1.1-1)*4/3.1 = 0.129 → 1
    assert(got == Set((1L, 4.0, 4L), (1L, 2.0, 2L), (1L, 1.0, 1L), (3L, 5.0, 4L)))
  }
}

class RankDiscountSpec extends SparkSuite {
  import spark.implicits._

  test("A9: k-th occurrence contributes score/ln(k+1) in neighbor order") {
    // query 1: neighbors ranked 1,2,3 with sims 0.9, 0.8, 0.7; book 42
    // appears for all three → 0.9/ln2 + 0.8/ln3 + 0.7/ln4;
    // book 7 only for neighbor 2 → 0.8/ln2.
    val df = Seq(
      (1L, 1, 0.9, 42L), (1L, 2, 0.8, 42L), (1L, 3, 0.7, 42L),
      (1L, 2, 0.8, 7L)
    ).toDF("query", "nrank", "sim", "bookId")
    val got = RankDiscount.discountedVotes(df, Seq("query"), "bookId", "sim",
        Seq(col("nrank").asc))
      .as[(Long, Long, Double)].collect().map(r => (r._2, r._3)).toMap
    val exp42 = 0.9 / math.log(2) + 0.8 / math.log(3) + 0.7 / math.log(4)
    val exp7 = 0.8 / math.log(2)
    assert(math.abs(got(42L) - exp42) < 1e-12)
    assert(math.abs(got(7L) - exp7) < 1e-12)
  }
}

class TopKSpec extends SparkSuite {
  import spark.implicits._

  test("W3: top-fraction uses int() floor — group of 25 at 0.1 keeps 2") {
    val df = (1 to 25).map(i => (1L, i.toDouble)).toDF("k", "v")
    val got = TopK.topFractionPerKey(df, Seq("k"), Seq(col("v").desc), 0.1)
    assert(got.count() == 2)
    assert(got.select("v").as[Double].collect().toSet == Set(25.0, 24.0))
  }

  test("W3: group smaller than 1/fraction keeps nothing") {
    val df = (1 to 9).map(i => (1L, i.toDouble)).toDF("k", "v")
    assert(TopK.topFractionPerKey(df, Seq("k"), Seq(col("v").desc), 0.1).count() == 0)
  }

  test("W1: per-key top-k with deterministic tie-break") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 4.0), (2L, 13L, 1.0))
      .toDF("k", "id", "v")
    val got = TopK.topKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 2)
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 13L)))
  }
}

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("F7: CJK title normalization dedups editions (golden cases)") {
    val titles = Seq("活着", "活着（精装）", "三体2 黑暗森林", "百年孤独",
      "围城 第2版", "战争与和平", "小-王·子")
    val got = titles.toDF("t")
      .select(TextFunctions.normalizeTitle(col("t"))).as[String].collect()
    assert(got(0) == "活着")
    assert(got(1) == "活着")       // （精装） stripped
    assert(got(2) == "三体")       // truncated at the digit
    assert(got(3) == "百年孤独")
    assert(got(4) == "围城")       // " 第2版" stripped (space class)
    assert(got(5) == "战争与和平")
    assert(got(6) == "小王子")     // -/· removed
  }

  test("F8/P8: tokenize + token filters") {
    val got = Seq("ab 1 cde  12345 f 科幻小说").toDF("t")
      .select(TextFunctions.filterTokens(TextFunctions.tokenize(col("t"))))
      .as[Seq[String]].collect().head
    assert(got == Seq("ab", "cde", "科幻小说"))
  }

  test("fingerprint: order-sensitive, whitespace-insensitive") {
    val fps = Seq("hello world", "hello  world ", "world hello").toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).as[Long].collect()
    assert(fps(0) == fps(1))   // whitespace squeezed
    assert(fps(0) != fps(2))   // order matters
  }

  test("F9: FMM segmentation — longest dict match, char fallback, latin runs") {
    val got = Seq("三体黑暗森林与activity小王子123 测试x").toDF("t")
      .select(TextFunctions.segment(col("t"))).as[Seq[String]].collect().head
    assert(got == Seq("三体", "黑暗森林", "与", "activity", "小王子", "123", "测试", "x"))
  }

  test("F9 full mode (cutAll): all overlapping dict words, jieba parity") {
    // jieba's canonical full-mode example: 我来到北京清华大学 with a
    // dictionary containing the overlapping words ⇒
    // 我/来到/北京/清华/清华大学/华大/大学 — 清华 AND 清华大学 both emitted
    // (ascending length at one position), 华大/大学 from interior starts,
    // 学 suppressed (covered, nothing starts there), 我 bare (uncovered).
    val dict = Seq("来到", "北京", "清华", "清华大学", "华大", "大学")
    val got = Seq("我来到北京清华大学").toDF("t")
      .select(TextFunctions.segment(col("t"), dict, cutAll = true))
      .as[Seq[String]].collect().head
    assert(got == Seq("我", "来到", "北京", "清华", "清华大学", "华大", "大学"))
    // FMM over the same input is the single greedy segmentation
    val fmm = Seq("我来到北京清华大学").toDF("t")
      .select(TextFunctions.segment(col("t"), dict))
      .as[Seq[String]].collect().head
    assert(fmm == Seq("我", "来到", "北京", "清华大学"))
    // non-CJK runs are whole tokens in both modes; bare chars emitted
    // only when uncovered
    val mixed = Seq("清华大学abc测试").toDF("t")
      .select(TextFunctions.segment(col("t"), dict, cutAll = true))
      .as[Seq[String]].collect().head
    assert(mixed == Seq("清华", "清华大学", "华大", "大学", "abc", "测", "试"))
  }

  test("F9 full mode via SQL arg and broadcast dict") {
    implicit val s = spark
    GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT cjk_segment('三体黑暗森林', true) AS seg")
      .as[Seq[String]].collect().head
    // default dict contains 三体, 黑暗森林, 黑暗, 森林? — assert vs the
    // literal-form full-mode output so the SQL arg is what's under test
    val lit = Seq("三体黑暗森林").toDF("t")
      .select(TextFunctions.segment(col("t"), cutAll = true))
      .as[Seq[String]].collect().head
    assert(sql == lit)
    val bc = Seq("三体黑暗森林").toDF("t")
      .select(TextFunctions.segmentBroadcast(col("t"),
        TextFunctions.defaultCjkDict, cutAll = true))
      .as[Seq[String]].collect().head
    assert(bc == lit)
  }

  test("F9: broadcast-dictionary segment matches the literal form at 10k+ words") {
    implicit val s = spark
    // corpus-scale lexicon: the real words plus 12k synthetic entries —
    // the broadcast form must segment identically while shipping the
    // dictionary via broadcast blocks, not inside the task binary
    val bigDict = TextFunctions.defaultCjkDict ++
      (0 until 12000).map(i => s"词$i")
    assert(bigDict.size > 10000)
    val texts = Seq("三体黑暗森林与activity小王子123 测试x",
      "词11999在词典里词99999不在", "战争与和平 百年孤独").toDF("t")
    val lit = texts.select(TextFunctions.segment(col("t"), bigDict))
      .as[Seq[String]].collect().toSeq
    val bc = texts.select(TextFunctions.segmentBroadcast(col("t"), bigDict))
      .as[Seq[String]].collect().toSeq
    assert(bc == lit)
    // synthetic dictionary words actually match (longest-match semantics)
    assert(bc(1).contains("词11999"))
    assert(!bc(1).contains("词99999"))
  }

  test("cleanText: NFC composition + control strip, structure kept") {
    val decomposed = "cafe\u0301"          // e + combining acute U+0301
    val got = Seq(s"ab\u0007c $decomposed\tkeep\nlines\r")
      .toDF("t").select(TextFunctions.cleanText(col("t")))
      .as[String].collect().head
    assert(got == "abc caf\u00e9\tkeep\nlines\r")   // BEL gone, e-acute composed
    // idempotent on already-clean text (NFC fast path returns input as-is)
    val clean = "plain ascii text"
    assert(Seq(clean).toDF("t").select(TextFunctions.cleanText(col("t")))
      .as[String].collect().head == clean)
  }

  test("redactPii: typed placeholders, containment order, counts") {
    val got = Seq(
      "mail a.b+c@x-1.co.uk now",
      "go to https://u:p@host.com/a?q=1&r=2 please",   // email-like inside URL
      "server 192.168.0.1 port",
      "call 12345678901 ref 999999",                    // 6 digits stays
      "clean text stays clean"
    ).toDF("t").select(TextFunctions.redactPii(col("t"))).as[String].collect()
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "go to <URL> please", s"URL must win containment: ${got(1)}")
    assert(got(2) == "server <IP> port")
    assert(got(3) == "call <NUM> ref 999999")
    assert(got(4) == "clean text stays clean")

    val c = Seq("x@y.io and http://a.b plus 10.0.0.1 and 10.0.0.2")
      .toDF("t").select(TextFunctions.piiCounts(col("t")).as("c"))
      .select("c.n_url", "c.n_email", "c.n_ip")
      .as[(Int, Int, Int)].collect().head
    assert(c == ((1, 1, 2)))
  }

  test("langId: script + marker heuristics") {
    val got = Seq("the cat is on the mat and it is happy",
      "el gato que está en la casa y los perros",
      "中文文本 测试").toDF("t")
      .select(TextFunctions.langIdHeuristic(col("t"))).as[String].collect()
    assert(got.toSeq == Seq("en", "es", "zh"))
  }
}

class SimilarityJoinSpec extends SparkSuite {
  import spark.implicits._

  test("J7: exact cosine matches hand computation on a 3-doc corpus") {
    // d1 = [a a b], d2 = [a b], d3 = [c]
    val docs = Seq((1L, Seq("a", "a", "b")), (2L, Seq("a", "b")), (3L, Seq("c")))
      .toDF("id", "toks")
    val got = SimilarityJoin.exactCosineTopK(docs, "id", "toks", k = 5)
      .select("a", "b", "sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // cos(d1,d2) = (2*1+1*1)/(sqrt(5)*sqrt(2)) = 3/sqrt(10)
    val exp = 3.0 / math.sqrt(10.0)
    assert(math.abs(got((1L, 2L)) - exp) < 1e-12)
    assert(math.abs(got((2L, 1L)) - exp) < 1e-12)
    assert(!got.contains((1L, 3L)))   // no shared terms → no pair generated
    assert(!got.contains((1L, 1L)))   // no self pairs
  }

  test("J7: maxDf prunes ubiquitous terms from pair generation") {
    val docs = Seq((1L, Seq("x", "a")), (2L, Seq("x", "b")), (3L, Seq("x", "c")))
      .toDF("id", "toks")
    // "x" appears in all 3 docs; maxDf=2 removes it → no pairs at all
    val got = SimilarityJoin.exactCosineTopK(docs, "id", "toks", k = 5, maxDf = 2L)
    assert(got.count() == 0)
  }

  test("J7: maxDfFraction prunes corpus-relative hot terms; norms stay full-vocab") {
    val docs = Seq(
      (1L, Seq("x", "a")), (2L, Seq("x", "a")),
      (3L, Seq("x", "b")), (4L, Seq("x", "c"))).toDF("id", "toks")
    // "x" is in 4/4 docs (df 4 > floor(4*0.5)=2) → pruned; "a" is in 2/4
    // (df 2 <= 2) → kept, so only the 1↔2 pair survives
    val got = SimilarityJoin.exactCosineTopK(docs, "id", "toks", k = 5,
        maxDfFraction = 0.5)
      .select("a", "b", "sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet == Set((1L, 2L), (2L, 1L)))
    // documented underestimate semantics: dot drops pruned "x" (1*1 from
    // "a" only) but norms keep the full vocabulary (sqrt(2) each)
    assert(math.abs(got((1L, 2L)) - 1.0 / 2.0) < 1e-12)
  }
}

class PageRankSpec extends SparkSuite {
  import spark.implicits._

  test("one iteration matches the hand-worked formula on a 3-node graph") {
    // edges 1→2, 1→3, 2→3, 3→1; N=3, out(1)=2, out(2)=1, out(3)=1,
    // pr_0 = 1/3. Hand: pr_1(1) = 0.05 + 0.85*(1/3) = 1/3;
    // pr_1(2) = 0.05 + 0.85*(1/6); pr_1(3) = 0.05 + 0.85*(1/6 + 1/3)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = graft.operators.PageRank.pageRank(e, "s", "d", iterations = 1)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - (0.05 + 0.85 / 3.0)) < 1e-12)
    assert(math.abs(got(2L) - (0.05 + 0.85 / 6.0)) < 1e-12)
    assert(math.abs(got(3L) - (0.05 + 0.85 * 0.5)) < 1e-12)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)   // no dangling nodes
  }

  test("dangling sink absorbs rank; totals drop below 1 (documented variant)") {
    // 1→2, 3→2: node 2 has no out-edges, its mass is not redistributed
    val e = Seq((1L, 2L), (3L, 2L)).toDF("s", "d")
    val got = graft.operators.PageRank.pageRank(e, "s", "d", iterations = 2)
      .as[(Long, Double)].collect().toMap
    assert(got(2L) > got(1L) && got(1L) == got(3L))
    assert(got.values.sum < 1.0)
  }

  test("converging ranks: a hub gains rank over iterations") {
    // star: 1..5 all point to 6, 6 points to 1
    val e = ((1L to 5L).map(i => (i, 6L)) :+ (6L, 1L)).toDF("s", "d")
    val pr3 = graft.operators.PageRank.pageRank(e, "s", "d", iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr3(6L) > pr3(1L) && pr3(1L) > pr3(2L))
    assert(pr3(2L) == pr3(5L))
    assert(math.abs(pr3.values.sum - 1.0) < 1e-12)
  }
}
