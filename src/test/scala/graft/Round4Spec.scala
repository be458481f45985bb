package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Scd}
import graft.rank.Fusion

/** Round-4 operators on hand-computable inputs: RRF fusion, temperature
  * sampling, keep-best corpus dedup, SCD2 history compression. */
class Round4Spec extends SparkSuite {
  import spark.implicits._

  // ---- Fusion.rrf -------------------------------------------------------

  test("rrf sums 1/(k+rank) across legs; absent ranks contribute nothing") {
    val lex = Seq((1L, 1), (2L, 2)).toDF("id", "r")
    val dense = Seq((2L, 1), (3L, 2)).toDF("id", "r")
    val got = Fusion.rrf(Seq(lex, dense), "id", "r", k = 60)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 1.0 / 61) < 1e-12)
    assert(math.abs(got(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(got(3L) - 1.0 / 62) < 1e-12)
  }

  test("rrf fuses three legs and respects a custom k") {
    val legs = Seq(Seq((7L, 1)), Seq((7L, 3)), Seq((7L, 5)))
      .map(_.toDF("id", "r"))
    val got = Fusion.rrf(legs, "id", "r", k = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(7L) - (1.0 / 11 + 1.0 / 13 + 1.0 / 15)) < 1e-12)
  }

  // ---- Sampling.temperatureSample --------------------------------------

  private def mixDf = {
    // strata: a = 400 rows, b = 100 rows
    val rows = (0L until 400L).map(i => (i, "a")) ++
      (400L until 500L).map(i => (i, "b"))
    rows.toDF("id", "stratum")
  }

  test("temperature alpha=1 keeps the natural mix (everything)") {
    assert(Sampling.temperatureSample(mixDf, "stratum", "id",
      seed = 1L, alpha = 1.0).count() == 500L)
  }

  test("temperature alpha=0 equalizes: big stratum keeps ~n_min rows, " +
      "smallest kept whole") {
    val got = Sampling.temperatureSample(mixDf, "stratum", "id",
        seed = 1L, alpha = 0.0)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(got("b") == 100L)                       // binding stratum whole
    // f_a = 100/400 = 0.25 exactly; hash buckets are near-uniform, so the
    // kept count is binomial(400, .25) — allow generous slack
    assert(got("a") >= 60L && got("a") <= 140L)
  }

  test("temperature alpha=0.5 keeps fraction sqrt(n_min/n_s) and is " +
      "deterministic") {
    val a = Sampling.temperatureSample(mixDf, "stratum", "id",
      seed = 9L, alpha = 0.5)
    val b = Sampling.temperatureSample(mixDf, "stratum", "id",
      seed = 9L, alpha = 0.5)
    assert(a.select("id").as[Long].collect().sorted.toSeq ==
      b.select("id").as[Long].collect().sorted.toSeq)
    val counts = a.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(counts("b") == 100L)
    // f_a = sqrt(.25) = .5 → expect ~200 of 400
    assert(counts("a") >= 140L && counts("a") <= 260L)
  }

  // ---- Dedup.dedupCorpusKeepBest ---------------------------------------

  private def dupCorpus = {
    // docs 1,2,3 near-identical (one cluster), 4 unique; quality picks 2
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, t + " one", 5.0),
      (2L, t + " two", 9.0),          // best in cluster
      (3L, t + " six", 7.0),
      (4L, "completely different text with no overlap at all here", 1.0)
    ).toDF("id", "text", "quality")
  }

  test("keep-best dedup keeps the argmax-quality doc per cluster") {
    val got = Dedup.dedupCorpusKeepBest(dupCorpus, "id", "text", "quality",
        bands = 24, rows = 4, minJaccard = 0.6)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 4L))
  }

  test("keep-best distributed path (threshold 0) matches the driver path") {
    val small = Dedup.dedupCorpusKeepBest(dupCorpus, "id", "text", "quality",
      bands = 24, rows = 4, minJaccard = 0.6)
    val staged = Dedup.dedupCorpusKeepBestStaged(dupCorpus, "id", "text",
      "quality", bands = 24, rows = 4, minJaccard = 0.6,
      smallGraphThreshold = 0)
    val dist = staged.df.select("id").as[Long].collect().sorted.toSeq
    staged.release()
    assert(dist == small.select("id").as[Long].collect().sorted.toSeq)
  }

  test("keep-best quality ties break toward the smallest id") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((8L, t + " x", 3.0), (9L, t + " y", 3.0))
      .toDF("id", "text", "quality")
    val got = Dedup.dedupCorpusKeepBest(df, "id", "text", "quality",
        bands = 24, rows = 4, minJaccard = 0.6)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(8L))
  }

  // ---- Scd.scd2 --------------------------------------------------------

  test("scd2 compresses runs and chains valid_from/valid_to") {
    val df = Seq(
      (1L, 10L, "2024-01-01", "A"),
      (1L, 11L, "2024-02-01", "A"),   // no change — absorbed
      (1L, 12L, "2024-03-01", "B"),   // change → new interval
      (1L, 13L, "2024-04-01", "A"),   // change back → new interval
      (2L, 20L, "2024-01-15", "C")
    ).toDF("k", "seq", "d", "attr").withColumn("d", to_date(col("d")))
    val got = Scd.scd2(df, "k", Seq(col("d"), col("seq")), "d", Seq("attr"))
      .select(col("k"), col("attr"), col("valid_from").cast("string"),
        col("valid_to").cast("string"))
      .as[(Long, String, String, String)].collect().toSeq
      .sortBy(r => (r._1, r._3))
    assert(got == Seq(
      (1L, "A", "2024-01-01", "2024-03-01"),
      (1L, "B", "2024-03-01", "2024-04-01"),
      (1L, "A", "2024-04-01", null),
      (2L, "C", "2024-01-15", null)
    ).sortBy(r => (r._1, r._3)))
  }

  test("scd2 ties on the date column resolve by the tie-break order col") {
    // two same-day rows with different attrs: the orderkey order decides
    // which opens first; both intervals appear, deterministically
    val df = Seq(
      (1L, 30L, "2024-01-01", "A"),
      (1L, 31L, "2024-01-01", "B")
    ).toDF("k", "seq", "d", "attr").withColumn("d", to_date(col("d")))
    val got = Scd.scd2(df, "k", Seq(col("d"), col("seq")), "d", Seq("attr"),
        carryCols = Seq("seq"))
      .select(col("seq"), col("attr")).as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq((30L, "A"), (31L, "B")))
  }
}
