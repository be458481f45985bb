package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Sessionize}

class SessionizeSamplingSpec extends SparkSuite {
  import spark.implicits._

  test("sessionize: gap splits sessions, ids are 0-based per user") {
    // user 1: events at 0, 10, 100 with gap 50 → sessions {0,10} and {100};
    // user 2: single event → one session
    val ev = Seq((1L, 10L, 0L), (1L, 11L, 10L), (1L, 12L, 100L),
      (2L, 20L, 5L)).toDF("u", "eid", "t")
    val got = Sessionize.sessionize(ev, "u", "t", gap = 50L, tieBreak = col("eid"))
      .select("u", "eid", "session_id").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 10L)) == 0L && got((1L, 11L)) == 0L)
    assert(got((1L, 12L)) == 1L)
    assert(got((2L, 20L)) == 0L)
  }

  test("sessionStats: counts, totals, longest duration") {
    val ev = Seq((1L, 10L, 0L), (1L, 11L, 10L), (1L, 12L, 100L),
      (2L, 20L, 5L)).toDF("u", "eid", "t")
    val got = Sessionize.sessionStats(ev, "u", "t", gap = 50L,
        tieBreak = col("eid"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((2L, 3L, 10L)))   // 2 sessions, 3 events, max dur 10
    assert(got(2L) == ((1L, 1L, 0L)))
  }

  test("sessionize: equal timestamps are ordered by the tiebreak (total order)") {
    val ev = Seq((1L, 2L, 0L), (1L, 1L, 0L), (1L, 3L, 60L)).toDF("u", "eid", "t")
    val a = Sessionize.sessionize(ev, "u", "t", 50L, col("eid"))
      .orderBy("eid").select("session_id").as[Long].collect().toSeq
    assert(a == Seq(0L, 0L, 1L))
  }

  test("hashSplit: exhaustive disjoint cover with stable ~fractions") {
    val ids = (1L to 10000L).toDF("id")
    val split = Sampling.hashSplit(ids, "id", seed = 42L,
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)           // exhaustive, disjoint
    assert(math.abs(counts("train") - 8000L) < 400, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 200, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 200, counts.toString)
  }

  test("contiguousPack: boundary at the token budget, straddlers allowed") {
    import graft.operators.Packing
    // budget 10: docs of 4,4,4 → cum 4,8,12 → packs 0,0,0 (third starts
    // at 8 < 10 and straddles); then 7 → starts at 12 → pack 1
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 7L)).toDF("id", "n")
    val got = Packing.contiguousPack(docs, "n", maxTokens = 10L,
        bucketCol = lit(0), orderCol = col("id"))
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("ffdPack: hand-computed first-fit-decreasing assignment") {
    import graft.operators.Packing
    // budget 10, sizes desc: 7(id4), 6(id2), 4(id1), 3(id3), 2(id5).
    // FFD: 7→pack0(rem 3); 6→pack1(rem 4); 4→pack1(rem 0); 3→pack0(rem 0);
    // 2→pack2(rem 8)
    val docs = Seq((1L, 4L), (2L, 6L), (3L, 3L), (4L, 7L), (5L, 2L))
      .toDF("id", "n")
    val got = Packing.ffdPack(docs, "id", "n", maxTokens = 10L,
        bucketCol = lit("b"))
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == Map(4L -> 0L, 2L -> 1L, 1L -> 1L, 3L -> 0L, 5L -> 2L))
  }

  test("ffdPack: budget never exceeded; oversized doc gets its own pack; beats contiguous") {
    import graft.operators.Packing
    val rnd = new scala.util.Random(7)
    val docs = ((1 to 400).map(i => (i.toLong, (rnd.nextInt(900) + 100).toLong))
      :+ (401L, 5000L)).toDF("id", "n")   // one doc over the 2048 budget
    val packed = Packing.ffdPack(docs, "id", "n", maxTokens = 2048L,
        bucketCol = lit("b"))
    val perPack = packed.groupBy("pack_id")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("cnt"))
      .as[(Long, Long, Long)].collect()
    perPack.foreach { case (pid, tot, cnt) =>
      assert(tot <= 2048L || cnt == 1L,
        s"pack $pid over budget with $cnt docs ($tot tokens)")
    }
    // classic FFD guarantee vs the token-sum lower bound (OPT >= LB):
    // packs <= 11/9 * OPT + 1 (contiguous fill is NOT a fair comparison —
    // it straddles boundaries, so its packs are all exactly full)
    val ffdPacks = perPack.length.toLong
    val total = docs.select(sum(col("n"))).as[Long].head()
    val lb = (total + 2047) / 2048
    assert(ffdPacks <= lb * 11 / 9 + 1,
      s"FFD ($ffdPacks packs) exceeds its 11/9 bound over LB=$lb")
  }

  test("stratifiedSample: per-stratum fractions, default keeps unnamed strata") {
    val df = (0 until 4000).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    val got = Sampling.stratifiedSample(df, "src", "id", seed = 3L,
        fractions = Map("s0" -> 0.5, "s1" -> 0.1, "s2" -> 0.0))
      .groupBy("src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(math.abs(got("s0") - 500) < 80, s"s0: $got")
    assert(math.abs(got("s1") - 100) < 50, s"s1: $got")
    assert(!got.contains("s2"))
    assert(got("s3") == 1000)   // defaultFraction = 1.0 keeps all
  }

  test("domainMix: composition tracks targets, binding stratum kept whole") {
    // availability 1000/1000/1000/200 with targets 40/30/20/10 → src3 is
    // NOT binding (200 >= 0.1*T for T<=2000); src0 binds at T=2500 > data?
    // T = min(n_s/t_s) = min(2500, 3333, 5000, 2000) = 2000: src3 whole
    val df = ((0 until 1000).map(i => (i.toLong, "a")) ++
      (10000 until 11000).map(i => (i.toLong, "b")) ++
      (20000 until 21000).map(i => (i.toLong, "c")) ++
      (30000 until 30200).map(i => (i.toLong, "d"))).toDF("id", "src")
    val got = Sampling.domainMix(df, "src", "id", seed = 9L,
        targets = Map("a" -> 0.4, "b" -> 0.3, "c" -> 0.2, "d" -> 0.1))
      .groupBy("src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // binding stratum d (n=200, target 10% → T=2000) survives whole
    assert(got("d") == 200, s"binding stratum downsampled: $got")
    // others track T * target within hash-bucket noise
    assert(math.abs(got("a") - 800) < 120, s"a: $got")
    assert(math.abs(got("b") - 600) < 110, s"b: $got")
    assert(math.abs(got("c") - 400) < 100, s"c: $got")
    // membership is deterministic: same call, same survivors
    val again = Sampling.domainMix(df, "src", "id", seed = 9L,
        targets = Map("a" -> 0.4, "b" -> 0.3, "c" -> 0.2, "d" -> 0.1))
      .select("id").as[Long].collect().toSet
    val first = Sampling.domainMix(df.repartition(13), "src", "id", seed = 9L,
        targets = Map("a" -> 0.4, "b" -> 0.3, "c" -> 0.2, "d" -> 0.1))
      .select("id").as[Long].collect().toSet
    assert(again == first, "membership must not depend on partitioning")
  }

  test("domainMix: unknown target stratum fails fast") {
    val df = Seq((1L, "a")).toDF("id", "src")
    val err = intercept[IllegalArgumentException] {
      Sampling.domainMix(df, "src", "id", 1L, Map("a" -> 0.5, "zz" -> 0.5))
    }
    assert(err.getMessage.contains("zz"))
  }

  test("tokenBudget: prefix cut per stratum, boundary row included") {
    val docs = Seq(
      (1L, "a", 3L), (2L, "a", 4L), (3L, "a", 5L), (4L, "a", 2L),
      (5L, "b", 10L), (6L, "b", 1L),
      (7L, "c", 99L)                       // no budget -> dropped
    ).toDF("id", "src", "n")
    def take(budgets: Map[String, Long]): Seq[Long] =
      Sampling.tokenBudget(docs, "src", "id", "n", budgets)
        .select("id").as[Long].collect().sorted.toSeq
    // budget 8 on a: 3,4 fill 7 < 8, doc 3 crosses the boundary -> in;
    // doc 4 would start at 12 >= 8 -> out. b: doc 5 alone crosses 5.
    assert(take(Map("a" -> 8L, "b" -> 5L)) === Seq(1L, 2L, 3L, 5L))
    // exact-boundary budget: doc 3 starts AT 7 -> excluded
    assert(take(Map("a" -> 7L)) === Seq(1L, 2L))
    // tiny budget still yields the first row
    assert(take(Map("a" -> 1L)) === Seq(1L))
  }

  test("weightedSample: matches local top-k over the same keys; zero weights excluded") {
    val df = (1L to 200L).map(i => (i, if (i % 7 == 0) 0.0 else (i % 5 + 1).toDouble))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", seed = 7L, k = 20)
      .select("id").as[Long].collect().toSet
    // recompute the A-Res keys through Spark's own hash, select top-20
    // locally — the operator must agree exactly (selection + tie-break).
    // Mirrors the 52-bit strictly-open-(0,1) slice in Sampling.weightedSample.
    val keys = df.select(col("id"),
        (pmod(xxhash64(col("id"), lit(7L)), lit(1L << 52)) + 0.5) /
          lit((1L << 52).toDouble), col("w"))
      .as[(Long, Double, Double)].collect()
    val exp = keys.map { case (id, u, w) =>
        (id, if (w > 0.0) math.exp(math.log(u) / w) else 0.0)
      }.sortBy { case (id, key) => (-key, id) }.take(20).map(_._1).toSet
    assert(got == exp)
    assert(got.forall(_ % 7 != 0), "zero-weight rows must not be sampled")
  }

  test("weightedSample: inclusion probability rises with weight across seeds") {
    val df = ((1L to 99L).map(i => (i, 1.0)) :+ (100L, 50.0)).toDF("id", "w")
    val hits = (1L to 20L).count { seed =>
      Sampling.weightedSample(df, "id", "w", seed, k = 10)
        .select("id").as[Long].collect().contains(100L)
    }
    assert(hits >= 18, s"the 50x-weight row should almost always survive ($hits/20)")
  }

  test("weightedSample: plans TakeOrderedAndProject, not a global sort") {
    val df = (1L to 50L).map(i => (i, 1.0)).toDF("id", "w")
    val plan = Sampling.weightedSample(df, "id", "w", seed = 1L, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hashSplit: membership is a pure function of (id, seed)") {
    val ids = (1L to 500L).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.hashSplit(df, "id", 7L, Seq("a" -> 0.5, "b" -> 0.5))
        .select("id", "split").as[(Long, String)].collect().toMap
    val once = assign(ids)
    val again = assign(ids.repartition(13))       // partitioning-independent
    assert(once == again)
    val otherSeed = Sampling.hashSplit(ids, "id", 8L, Seq("a" -> 0.5, "b" -> 0.5))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(once != otherSeed)                     // seed actually matters
  }
}
