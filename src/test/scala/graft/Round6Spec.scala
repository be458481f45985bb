package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunker, Dedup, Sampling}

/** Round-6 operators: boilerplate line removal, sliding-window chunking,
  * deterministic shuffle-shard. */
class Round6Spec extends SparkSuite {
  import spark.implicits._

  // ---- boilerplateRemove -------------------------------------------------

  private def lines(c: String) = split(col(c), "\n")

  test("boilerplate: every occurrence of a frequent line drops, first included") {
    val docs = Seq(
      (1L, "accept cookies\nunique alpha\nfooter"),
      (2L, "accept cookies\nunique beta\nfooter"),
      (3L, "unique gamma\naccept cookies"),
      (4L, "only original text here")
    ).toDF("id", "text")
    val out = Dedup.boilerplateRemove(docs, "id", lines("text"), minDf = 2,
        sep = "\n")
      .orderBy("id").collect()
    // "accept cookies" df=3, "footer" df=2 -> both boilerplate everywhere
    assert(out(0).getAs[String]("kept_text") == "unique alpha")
    assert(out(0).getAs[Long]("n_lines") == 3L)
    assert(out(0).getAs[Long]("n_kept") == 1L)
    assert(out(1).getAs[String]("kept_text") == "unique beta")
    assert(out(2).getAs[String]("kept_text") == "unique gamma")
    assert(out(3).getAs[String]("kept_text") == "only original text here")
  }

  test("boilerplate: in-doc repetition does not self-promote (df is distinct docs)") {
    val docs = Seq(
      (1L, "chorus\nchorus\nchorus\nverse one"),
      (2L, "something else entirely")
    ).toDF("id", "text")
    val out = Dedup.boilerplateRemove(docs, "id", lines("text"), minDf = 2,
        sep = "\n")
      .where(col("id") === 1).collect()(0)
    // "chorus" appears 3x but only in doc 1 -> df=1 -> kept
    assert(out.getAs[Long]("n_kept") == 4L)
    assert(out.getAs[String]("kept_text") == "chorus\nchorus\nchorus\nverse one")
  }

  test("boilerplate: fully-boilerplate doc surfaces with n_kept=0, empty text") {
    val docs = Seq(
      (1L, "nav\nfooter"),
      (2L, "nav\nfooter"),
      (3L, "nav\nreal content")
    ).toDF("id", "text")
    val out = Dedup.boilerplateRemove(docs, "id", lines("text"), minDf = 2,
        sep = "\n")
      .orderBy("id").collect()
    assert(out.length == 3)               // no doc vanishes
    assert(out(0).getAs[Long]("n_kept") == 0L)
    assert(out(0).getAs[String]("kept_text") == "")
    assert(out(2).getAs[String]("kept_text") == "real content")
  }

  test("boilerplate: line order preserved in reassembly") {
    val docs = Seq(
      (1L, "z last\ncommon\na first\ncommon\nm middle"),
      (2L, "common")
    ).toDF("id", "text")
    val out = Dedup.boilerplateRemove(docs, "id", lines("text"), minDf = 2,
        sep = "\n")
      .where(col("id") === 1).collect()(0)
    assert(out.getAs[String]("kept_text") == "z last\na first\nm middle")
  }

  // ---- slidingTokenChunks ------------------------------------------------

  test("sliding chunks: window/stride arithmetic and overlap content") {
    val docs = Seq((1L, (1 to 13).map(i => s"w$i").mkString(" ")))
      .toDF("id", "text")
    val out = Chunker.slidingTokenChunks(docs, "id", "text",
        windowTokens = 8, strideTokens = 4)
      .orderBy("chunk_idx").collect()
    assert(out.length == 3) // ceil((13-8)/4)+1
    assert(out(0).getAs[String]("chunk_text") ==
      (1 to 8).map(i => s"w$i").mkString(" "))
    assert(out(1).getAs[String]("chunk_text") ==
      (5 to 12).map(i => s"w$i").mkString(" "))
    assert(out(2).getAs[String]("chunk_text") ==
      (9 to 13).map(i => s"w$i").mkString(" "))   // short tail
    assert(out(2).getAs[Long]("n_tokens") == 5L)
  }

  test("sliding chunks: doc shorter than one window yields itself") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    val out = Chunker.slidingTokenChunks(docs, "id", "text", 8, 4).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("chunk_text") == "a b c")
  }

  test("sliding chunks: stride == window degenerates to the disjoint grid") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("id", "text")
    val out = Chunker.slidingTokenChunks(docs, "id", "text", 5, 5)
      .orderBy("chunk_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("chunk_text") ==
      (1 to 5).map(i => s"w$i").mkString(" "))
    assert(out(1).getAs[String]("chunk_text") ==
      (6 to 10).map(i => s"w$i").mkString(" "))
  }

  test("sliding chunks: zero shuffle (no Exchange in the plan)") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("id", "text")
    val plan = Chunker.slidingTokenChunks(docs, "id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  // ---- HtmlText ----------------------------------------------------------

  private def html(s: String): String =
    graft.expressions.HtmlText.extract(s)

  test("html: tags strip to spaces, whitespace collapses, ends trim") {
    assert(html("<p>a</p><br><p>b</p>") == "a b")
    assert(html("  <div>\n  hello   world \n</div> ") == "hello world")
    assert(html("a<b>c") == "a c") // unterminated-free inline tag
  }

  test("html: script/style/comment blocks removed WITH contents") {
    assert(html("a<script>if (1 < 2) alert('</');</script>b") == "a b")
    assert(html("a<SCRIPT TYPE='x'>var y;</SCRIPT >b") == "a b") // case+attr
    assert(html("a<style>p { color: red }</style>b") == "a b")
    assert(html("a<!-- commented > out -->b") == "a b") // '>' inside comment
    // <scripted> is a PLAIN tag (boundary check), not a script block
    assert(html("a<scripted>b</scripted>c") == "a b c")
  }

  test("html: entities — the six named forms decode, the rest is literal") {
    assert(html("&amp;joined &lt;b&gt; it&#39;s &quot;q&quot; a&nbsp;b") ==
      "&joined <b> it's \"q\" a b")
    assert(html("x&apos;y") == "x'y")
    assert(html("&unknown; &#960; & x") == "&unknown; &#960; & x")
    // double-encoded stays single-decoded, never re-interpreted as a tag
    assert(html("&amp;lt;p&amp;gt;") == "&lt;p&gt;")
    assert(html("&lt;script&gt;not code&lt;/script&gt;") ==
      "<script>not code</script>")
  }

  test("html: stray '<' is literal text (HTML5 tokenizer rule)") {
    assert(html("1 < 2 and 3 > 2") == "1 < 2 and 3 > 2")
    assert(html("a < <em>b</em>") == "a < b")
  }

  test("html: malformed tails drop the rest, never throw") {
    assert(html("ok<script>never closed") == "ok")
    assert(html("ok<!-- never closed") == "ok")
    assert(html("ok<div unterminated") == "ok")
    assert(html("") == "")
  }

  test("html: null in, null out; column wrapper works in a plan") {
    val out = Seq((1L, "<p>x</p>"), (2L, null))
      .toDF("id", "h")
      .select(col("id"),
        graft.functions.TextFunctions.htmlText(col("h")).as("t"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "x")
    assert(out(1).isNullAt(1))
  }

  // ---- intraDocLineDedup -------------------------------------------------

  test("intra-doc dedup: first in-doc occurrence survives, order kept") {
    val docs = Seq(
      (1L, "read more\nalpha\nread more\nbeta\nalpha"),
      (2L, "read more\ngamma")   // other docs unaffected (doc-local rule)
    ).toDF("id", "text")
    val out = Dedup.intraDocLineDedup(docs, "id", lines("text"), sep = "\n")
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_lines") == 5L)
    assert(out(0).getAs[Long]("n_kept") == 3L)
    assert(out(0).getAs[String]("kept_text") == "read more\nalpha\nbeta")
    assert(out(1).getAs[String]("kept_text") == "read more\ngamma")
  }

  test("intra-doc dedup: zero shuffle (pure projection)") {
    val docs = Seq((1L, "a\nb\na")).toDF("id", "text")
    val plan = Dedup.intraDocLineDedup(docs, "id", lines("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  // ---- epochUpsample -----------------------------------------------------

  test("epoch upsample: floor copies + hash fraction, w=0 drops, " +
    "unmapped passes at 1.0, zero shuffle") {
    val df = (1L to 1000L).map(i =>
      (i, if (i <= 400) "a" else if (i <= 800) "b" else "c")).toDF("id", "s")
    val out = graft.operators.Sampling.epochUpsample(df, "s", "id",
      weights = Map("a" -> 2.5, "b" -> 0.0), seed = 7L)
    val counts = out.groupBy("s").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(!counts.contains("b"))                  // w=0 drops
    assert(counts("c") == 200L)                    // unmapped: exactly once
    // stratum a: every id gets 2 copies, the hash-selected half a third;
    // expected 400*2.5 = 1000 with binomial(400, 0.5) spread
    assert(counts("a") >= 800L && counts("a") <= 1200L)
    assert(counts("a") % 1L == 0L)
    val perId = out.where(col("s") === "a").groupBy("id")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect()
    assert(perId.forall(p => p._2 == 2L || p._2 == 3L)) // floor(2.5) + 0/1
    // copy indices are 0..n-1 per id (distinct replica keys)
    val copies = out.where(col("s") === "a" && col("id") === perId.head._1)
      .select("copy").as[Long].collect().sorted.toSeq
    assert(copies == (0L until perId.head._2).toSeq)
    // pure projection: no Exchange anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("epoch upsample: deterministic across partitionings") {
    val df = (1L to 300L).map(i => (i, "a")).toDF("id", "s")
    val a = graft.operators.Sampling.epochUpsample(df, "s", "id",
      Map("a" -> 1.3), seed = 9L).orderBy("id", "copy").collect()
    val b = graft.operators.Sampling.epochUpsample(df.repartition(13), "s",
      "id", Map("a" -> 1.3), seed = 9L).orderBy("id", "copy").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  // ---- semantic decontamination ------------------------------------------

  test("semantic decontam: equals the brute-force screen; benchmark empty " +
    "keeps everything") {
    import graft.functions.VectorFunctions.cosine
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("vec_id") >= 10)
    val bench = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("vec_id") < 10)
    val got = graft.operators.Decontaminate.semantic(
        corpus, "vec_id", "embedding", bench, "embedding", minCosine = 0.3)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val brute = corpus.select(col("vec_id"), col("embedding").as("cv"))
      .crossJoin(bench.select(col("embedding").as("bv")))
      .groupBy("vec_id").agg(max(cosine(col("cv"), col("bv"))).as("mx"))
      .where(col("mx") < 0.3)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(got == brute)
    assert(got.nonEmpty && got.size < corpus.count()) // screen actually bites
    val none = graft.operators.Decontaminate.semantic(
      corpus, "vec_id", "embedding", bench.where(lit(false)), "embedding", 0.3)
    assert(none.count() == corpus.count())
  }

  // ---- applyChanges (MERGE) ----------------------------------------------

  test("merge apply: update, insert, delete, pass-through, null-overwrite") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val chg = Seq(
      (2L, Some("B"), false),  // update
      (3L, None, false),       // explicit null overwrite (must WIN)
      (4L, Some("x"), true),   // delete
      (9L, Some("new"), false) // insert
    ).toDF("k", "v", "del")
    val out = graft.operators.SnapshotDiff
      .applyChanges(base, chg, "k", Seq("v"), "del")
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 9L))
    assert(out(0).getString(1) == "a")   // untouched
    assert(out(1).getString(1) == "B")   // updated
    assert(out(2).isNullAt(1))           // null overwrite, not coalesce
    assert(out(3).getString(1) == "new") // inserted
  }

  test("merge apply: delete of a missing key is a no-op insert-suppression") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val chg = Seq((7L, "x", true)).toDF("k", "v", "del")
    val out = graft.operators.SnapshotDiff
      .applyChanges(base, chg, "k", Seq("v"), "del").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  // ---- AccentFold --------------------------------------------------------

  test("accent fold: DuckDB strip_accents-verified goldens") {
    import graft.functions.TextFunctions.accentFold
    val cases = Seq(
      "café" -> "cafe", "naïve" -> "naive", "münchen" -> "munchen",
      "señor" -> "senor", "ÀÉÎÕÜ" -> "AEIOU",
      "ß sharp" -> "ß sharp",          // no decomposition -> untouched
      "łódź" -> "łodz",                // ł stays, ó/ź fold
      "crème brûlée" -> "creme brulee",
      "ācārya" -> "acarya", "Ελλάς" -> "Ελλας", "中文" -> "中文")
    val out = cases.map(_._1).toDF("s")
      .select(accentFold(col("s")).as("f")).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  // ---- JaroWinkler -------------------------------------------------------

  test("jaro-winkler: DuckDB-verified goldens, both boost regimes") {
    import graft.expressions.JaroWinkler.{jaro, similarity}
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    // values cross-checked against DuckDB jaro[_winkler]_similarity
    assert(close(jaro("MARTHA", "MARHTA"), 0.9444444444444445))
    assert(close(similarity("MARTHA", "MARHTA"), 0.9611111111111111))
    assert(close(similarity("DIXON", "DICKSONX"), 0.8133333333333332))
    assert(close(similarity("DWAYNE", "DUANE"), 0.84))
    assert(close(similarity("ABCDEF", "FEDCBA"), 0.3888888888888889))
    assert(close(similarity("aaaaaaaaab", "aaaaaaaaba"), 0.98))
    assert(close(similarity("abc", "axc"), 0.8))
    // ODD mismatch count: 3 crossed digits floor to t=1, not 1.5 — the
    // Winkler reference-implementation convention DuckDB follows (the
    // d18 gate caught the fractional reading diverging here)
    assert(close(similarity("Custoner#000000120", "Customer#000000012"),
      0.9660130718954249))
    // boost gated OFF at jaro <= 0.7 even with a common prefix
    assert(close(similarity("xy", "xz"), 2.0 / 3.0))
    // window 0: adjacent swap in 2-char strings matches nothing
    assert(similarity("ab", "ba") == 0.0)
    assert(similarity("same", "same") == 1.0)
    // DuckDB convention: empty (either or both) is 0, not 1
    assert(similarity("", "") == 0.0)
    assert(similarity("a", "") == 0.0)
  }

  // ---- shuffleShard ------------------------------------------------------

  test("shuffle-shard: reproducible, balanced-ish, contiguous positions") {
    val docs = (1L to 400L).toDF("id")
    val a = Sampling.shuffleShard(docs, "id", nShards = 8)
    val b = Sampling.shuffleShard(docs.repartition(7), "id", nShards = 8)
    // pure function of ids: identical across runs and partitionings
    assert(a.orderBy("id").collect().toSeq ==
      b.orderBy("id").collect().toSeq)
    val byShard = a.groupBy("shard").agg(count(lit(1)).as("n"),
        min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(byShard.length == 8)
    byShard.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L)                 // row_number from 1
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n")) // contiguous
      assert(r.getAs[Long]("n") > 20L)                  // no empty/mega shard
    }
    assert(a.select(sum(lit(1L))).collect()(0).getLong(0) == 400L)
  }

  test("e2e3 RAG chunk index: composition runs; self excluded; k bound; " +
    "deterministic across partitionings") {
    val out = graft.SparkEntry.queries("e2e3_rag_chunk_index")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getString(0) != r.getString(1))) // no self-match
    val perQuery = out.groupBy(_.getString(0)).values.map(_.length)
    assert(perQuery.forall(_ <= 3))                           // k bound
    val again = graft.SparkEntry.queries("e2e3_rag_chunk_index")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("shuffle-shard: order is decorrelated from id order") {
    val docs = (1L to 200L).toDF("id")
    val out = Sampling.shuffleShard(docs, "id", nShards = 1)
      .orderBy("pos").select("id").as[Long].collect()
    // a hash order agreeing with ingest order anywhere near the start
    // would mean the salt isn't doing its job
    assert(out.take(20).toSeq != (1L to 20L).toSeq)
    assert(out.sorted.toSeq == (1L to 200L).toSeq)      // a permutation
  }
}
