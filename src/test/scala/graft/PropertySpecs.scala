package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{AsOfJoin, Dedup, RangeJoin, TopK, Weighting}
import graft.functions.TextFunctions

/** Property-based invariants (SURVEY §5.4), driven by raw scalacheck
  * generators over seeded samples: weight buckets always in [1, nBuckets];
  * per-key top-k sizes respect caps; Jaccard bounds; normalized titles
  * idempotent; fingerprints whitespace-stable. */
class PropertySpecs extends SparkSuite {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong * 7919)))

  private val groupGen: Gen[List[(Long, Double)]] = for {
    nGroups <- Gen.choose(1, 4)
    rows <- Gen.listOfN(nGroups * 5, Gen.zip(
      Gen.choose(1L, nGroups.toLong), Gen.choose(0.0, 100.0)))
  } yield rows

  test("A2 property: buckets always land in [1, 4]") {
    samples(groupGen, 10).filter(_.nonEmpty).foreach { rows =>
      val buckets = Weighting.minMaxBucket(rows.toDF("k", "v"), "k", "v")
        .select("bucket").as[Long].collect()
      assert(buckets.forall(b => b >= 1 && b <= 4), s"out-of-range in $rows")
    }
  }

  test("W1 property: per-key top-k never exceeds k, and honors group size") {
    samples(groupGen, 10).filter(_.nonEmpty).foreach { rows =>
      val k = 3
      val got = TopK.topKPerKey(rows.toDF("k", "v"), Seq("k"),
          Seq(col("v").desc, col("v").asc), k)
        .groupBy("k").count().as[(Long, Long)].collect().toMap
      val sizes = rows.groupBy(_._1).view.mapValues(_.size).toMap
      got.foreach { case (key, n) => assert(n <= k && n <= sizes(key)) }
    }
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    "spark", "table", "scan", "the", "a", "数据", "分析", "12", "x"))
    .map(_.mkString(" "))

  test("F7 property: title normalization is idempotent") {
    val titles = samples(textGen, 40)
    val df = titles.toDF("t")
    val twice = df.select(TextFunctions.normalizeTitle(col("t")).as("n1"))
      .select(col("n1"), TextFunctions.normalizeTitle(col("n1")).as("n2"))
    assert(twice.where(col("n1") =!= col("n2")).count() == 0)
  }

  test("fingerprint property: invariant under whitespace renoising") {
    val texts = samples(textGen, 30)
    val noised = texts.map(t => "  " + t.replace(" ", "   ") + " ")
    val a = texts.toDF("t").select(TextFunctions.fingerprint(col("t")))
      .as[Long].collect().toSeq
    val b = noised.toDF("t").select(TextFunctions.fingerprint(col("t")))
      .as[Long].collect().toSeq
    assert(a == b)
  }

  test("Jaccard property: pairs are (a<b), values in [0,1], dups score 1") {
    val texts = samples(textGen.suchThat(_.length >= 3), 8).take(5)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      texts.zipWithIndex.map { case (t, i) => (100L + i, t) }   // exact dups
    val pairs = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, minJaccard = 0.0)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall { case (a, b, j) => a < b && j >= 0.0 && j <= 1.0 + 1e-12 })
    val dupPairs = pairs.filter { case (a, b, _) => b == a + 100 }
    assert(dupPairs.nonEmpty && dupPairs.forall(_._3 > 0.9999))
  }

  test("RESP property: encode(args) parses back as the same bulk-string array") {
    import graft.io.Resp
    // arbitrary unicode commands (incl. CJK + CRLF-bearing payloads): the
    // $-length prefix counts BYTES, so parse(encode(x)) must be lossless
    val argGen = Gen.listOfN(3, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.const("三体,活着 图书"),
      Gen.const("line1\r\nline2\n$5\r\nfake"),
      Gen.const("")))
    samples(argGen, 40).filter(_.nonEmpty).foreach { args =>
      val in = new java.io.BufferedInputStream(
        new java.io.ByteArrayInputStream(Resp.encode(args)))
      val got = Resp.readValue(in)
      assert(got == Resp.Arr(args.map(a => Resp.Bulk(Some(a)))),
        s"round-trip failed for $args")
    }
  }

  test("J12 property: asOf equals the brute-force latest-at-or-before match") {
    // random (key, ts) event sets with duplicate timestamps and sparse
    // keys — asOf must agree with the quadratic reference on every row
    val evGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 30L)))
    } yield rows
    samples(Gen.zip(evGen, evGen), 8).foreach { case (lRows, rRowsRaw) =>
      // right unique per (key, ts): asOf's documented precondition
      val rRows = rRowsRaw.distinct.map { case (k, ts) => (k, ts, k * 100 + ts) }
      val left = lRows.toDF("k", "ts")
      val right = rRows.toDF("k", "ts", "v")
      val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
        .select("k", "ts", "v").as[(Long, Long, Option[Long])]
        .collect().sorted.toSeq
      val exp = lRows.map { case (k, ts) =>
        val m = rRows.filter(r => r._1 == k && r._2 <= ts)
        (k, ts, m.sortBy(_._2).lastOption.map(_._3))
      }.sorted.toSeq
      assert(got == exp, s"left=$lRows right=$rRows")
    }
  }

  test("J13 property: bucketed range join equals the brute-force BETWEEN join") {
    val ptsGen: Gen[List[(Long, Double)]] = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 999L), Gen.choose(0.0, 50.0)))
    } yield rows
    val ivGen: Gen[List[(Long, Double, Double)]] = for {
      n <- Gen.choose(1, 10)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 99L),
        Gen.choose(0.0, 45.0), Gen.choose(0.0, 12.0)))
    } yield rows.map { case (id, lo, span) => (id, lo, lo + span) }
    samples(Gen.zip(ptsGen, ivGen), 8).foreach { case (pts, ivs) =>
      val p = pts.toDF("pid", "x")
      val i = ivs.toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(p, i, "x", "lo", "hi",
          bucketWidth = 5.0)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val exp = (for {
        (pid, x) <- pts
        (iid, lo, hi) <- ivs
        if x >= lo && x <= hi
      } yield (pid, iid)).sorted.toSeq
      assert(got == exp, s"pts=$pts ivs=$ivs")
    }
  }

  test("F9 property: broadcast and literal dictionaries segment identically") {
    implicit val s = spark
    val dict = TextFunctions.defaultCjkDict
    val cjkChar = Gen.oneOf("三体黑暗森林活着围城小王子战争与和平abc 123".toSeq)
    val strGen = Gen.listOfN(20, cjkChar).map(_.mkString)
    val texts = samples(strGen, 30)
    val lit = texts.toDF("t").select(TextFunctions.segment(col("t"), dict))
      .as[Seq[String]].collect().toSeq
    val bc = texts.toDF("t")
      .select(TextFunctions.segmentBroadcast(col("t"), dict))
      .as[Seq[String]].collect().toSeq
    assert(bc == lit)
    // segmentation is a partition: concatenating tokens (minus whitespace)
    // reconstructs the input
    texts.zip(lit).foreach { case (t, toks) =>
      assert(toks.mkString == t.replace(" ", ""))
    }
  }
}
