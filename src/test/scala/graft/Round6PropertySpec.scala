package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Chunker, Dedup, Sampling}

/** Property-based invariants for the round-6 operators, driven by seeded
  * scalacheck samples (the PropertySpecs harness). */
class Round6PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong * 104729)))

  private val wordGen: Gen[String] =
    Gen.oneOf("nav", "footer", "alpha", "beta", "gamma", "delta", "login",
      "search", "cookie", "accept")
  private val docGen: Gen[List[String]] = // a doc = its line list
    Gen.listOfN(8, Gen.listOfN(3, wordGen).map(_.mkString(" ")))
  private val corpusGen: Gen[List[(Long, List[String])]] =
    Gen.listOfN(12, docGen).map(_.zipWithIndex.map { case (d, i) =>
      (i.toLong + 1, d) })

  test("boilerplateRemove property: equals the brute-force rule") {
    samples(corpusGen, 5).foreach { corpus =>
      val minDf = 3
      // brute force on the driver: df = distinct docs per line
      val df = corpus.flatMap { case (id, ls) => ls.distinct.map((_, id)) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val boiler = df.filter(_._2 >= minDf).keySet
      val expected = corpus.map { case (id, ls) =>
        (id, ls.size.toLong, ls.count(!boiler(_)).toLong,
          ls.filterNot(boiler).mkString("\n"))
      }.sortBy(_._1)
      val got = Dedup.boilerplateRemove(
          corpus.map { case (id, ls) => (id, ls) }.toDF("id", "lines"),
          "id", col("lines"), minDf = minDf, sep = "\n")
        .orderBy("id")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got == expected)
    }
  }

  test("slidingTokenChunks property: full coverage, exact overlap, " +
    "concatenation of stride-prefixes reconstructs the document") {
    val textGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.zipWithIndex
        .map { case (w, i) => s"$w$i" }.mkString(" "))) // unique tokens
    samples(textGen, 8).foreach { text =>
      val toks = text.split(" ").toSeq
      for ((w, st) <- Seq((8, 4), (5, 5), (6, 2))) {
        val chunks = Chunker.slidingTokenChunks(
            Seq((1L, text)).toDF("id", "text"), "id", "text", w, st)
          .orderBy("chunk_idx")
          .select("chunk_text").as[String].collect().toSeq
          .map(_.split(" ").filter(_.nonEmpty).toSeq)
        // every token appears in at least one chunk, in order
        assert(chunks.flatten.distinct == toks.distinct)
        // consecutive chunks overlap by exactly w - st tokens (when the
        // predecessor extends past one stride; at w == st the windows are
        // disjoint and the reassembly law below carries the check)
        chunks.sliding(2).foreach {
          case Seq(a, b) if a.length > st =>
            assert(b.headOption == a.drop(st).headOption)
          case _ =>
        }
        // stride-prefixes + last chunk reassemble the document exactly
        val rebuilt = chunks.dropRight(1).flatMap(_.take(st)) ++ chunks.last
        assert(rebuilt == toks, s"w=$w st=$st reassembly")
      }
    }
  }

  test("intraDocLineDedup property: equals keep-first brute force; idempotent") {
    samples(corpusGen, 5).foreach { corpus =>
      val expected = corpus.map { case (id, ls) =>
        (id, ls.size.toLong, ls.distinct.size.toLong, ls.distinct.mkString("\n"))
      }.sortBy(_._1)
      val in = corpus.toDF("id", "lines")
      val got = Dedup.intraDocLineDedup(in, "id", col("lines"), sep = "\n")
        .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
      assert(got == expected)
      // applying the rule to its own output changes nothing
      val again = Dedup.intraDocLineDedup(
          got.map { case (id, _, _, t) => (id, t.split("\n").toSeq) }
            .toDF("id", "lines"), "id", col("lines"), sep = "\n")
        .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
      assert(again.map(r => (r._1, r._4)) == got.map(r => (r._1, r._4)))
    }
  }

  test("shuffleShard property: a permutation; shard+pos unique; stable " +
    "under input permutation and id-subsetting of OTHER shards") {
    val ids = (1L to 300L)
    val out = Sampling.shuffleShard(ids.toDF("id"), "id", nShards = 6)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).sorted == ids.toSeq)            // permutation
    assert(out.map(r => (r._2, r._3)).distinct.size == out.size)
    // shard routing is per-id: removing every row of shard 0 leaves the
    // other shards' (id, shard, pos) assignments IDENTICAL — the lost-
    // shard re-materialization property
    val keep = out.filter(_._2 != 0L).map(_._1)
    val again = Sampling.shuffleShard(keep.toDF("id"), "id", nShards = 6)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(again.toSet == out.filter(_._2 != 0L).toSet)
  }

  test("HtmlText property: plain text (no markup chars) is fixed up to " +
    "whitespace collapse; output never contains a tag") {
    val plainGen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString("  ")))
    samples(plainGen, 10).foreach { s =>
      val got = graft.expressions.HtmlText.extract(s)
      assert(got == s.trim.replaceAll("\\s+", " "))
      // idempotence on its own output
      assert(graft.expressions.HtmlText.extract(got) == got)
    }
    val wrapped = samples(plainGen, 5).map(s => s"<div><p>$s</p></div>")
    wrapped.foreach { h =>
      val got = graft.expressions.HtmlText.extract(h)
      assert(!got.contains("<div") && !got.contains("</p>"))
    }
  }

  test("rollingUniques property: equals the brute-force trailing window") {
    val evGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0, 20), Gen.choose(1L, 15L))) // (day offset, user)
    samples(evGen, 4).foreach { evs =>
      val base = java.time.LocalDate.of(2024, 3, 1)
      val rows = evs.map { case (d, u) =>
        (java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay()
          .plusHours((u % 23).toInt)), u)
      }
      val expected = {
        val dayUser = evs.map { case (d, u) => (d, u) }.distinct
        val days = dayUser.map(_._1).distinct.sorted
        days.map { d =>
          (base.plusDays(d).toString,
            dayUser.filter(du => du._1 <= d && du._1 > d - 7)
              .map(_._2).distinct.size.toLong)
        }
      }
      val got = graft.operators.Funnel.rollingUniques(
          rows.toDF("t", "user_id"), "user_id", "t", windowDays = 7)
        .orderBy("day")
        .select(col("day").cast("string"), col("uniques"))
        .as[(String, Long)].collect().toSeq
      assert(got == expected)
    }
  }

  test("mp3_features / html_text are reachable from SQL (extensions)") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT html_text('<p>a&amp;b</p>') AS t, " +
        "mp3_features(CAST('junk' AS BINARY)) AS m").collect()(0)
    assert(r.getString(0) == "a&b")
    assert(r.isNullAt(1))
  }
}
