package graft

import org.apache.spark.sql.functions._
import graft.jobs.CorpusPrep

/** Composition invariants of the end-to-end corpus-prep pipeline; each
  * stage's exactness is gated by its own oracle query (t3/t4/d5/s11/s12). */
class CorpusPrepSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = {
    // genuinely distinct CHARACTER content per doc (char-3-gram Jaccard is
    // what dedup sees — a shared word template merges the whole corpus)
    def body(i: Long): String = {
      val rnd = new scala.util.Random(i)
      (1 to 8).map(_ => rnd.alphanumeric.filter(_.isLetter).take(7).mkString)
        .mkString(" ")
    }
    val base = (1L to 60L).map(i => (i, s"doc ${body(i)}"))
    // near-duplicates of docs 1-5 (one char appended) and two junk rows
    // the quality filter should drop (scores ~0.33, below 0.4)
    val dups = (1L to 5L).map(i => (100L + i, s"doc ${body(i)}!"))
    val junk = Seq((200L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
      (201L, "$$$ ### @@@ %%%"))
    (base ++ dups ++ junk).toDF("doc_id", "text")
  }

  test("prepare: quality junk dropped, near-dups collapsed, survivors ⊆ input") {
    val out = CorpusPrep.prepare(corpus, "doc_id", "text",
      CorpusPrep.Config(minQuality = 0.4, dedupMinJaccard = 0.7))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(200L) && !ids.contains(201L), "junk survived")
    // min-id survivorship: each near-dup pair keeps the smaller id
    (1L to 5L).foreach { i =>
      assert(ids.contains(i) && !ids.contains(100L + i),
        s"dup of $i not collapsed: $ids")
    }
    // distinct docs survive (no over-merging from the shared "doc" prefix)
    assert((6L to 60L).forall(ids.contains), s"distinct docs dropped: $ids")
    assert(ids.subsetOf((1L to 201L).toSet))
  }

  test("prepareAudited: in-flight counters cover raw input and post-filter corpus") {
    val p = CorpusPrep.prepareAudited(corpus, "doc_id", "text",
      CorpusPrep.Config(minQuality = 0.4, dedupMinJaccard = 0.7))
    p.df.count()
    assert(p.input.get("rows") == 67L, "input audit must cover every raw row")
    val kept = p.kept.get("rows").asInstanceOf[Long]
    assert(kept == 65L, s"quality filter drops exactly the two junk rows ($kept)")
    assert(p.input.get("null_ids") == 0L)
  }

  test("prepare: packs never mix splits; token budget respected at pack starts") {
    val out = CorpusPrep.prepare(corpus, "doc_id", "text",
      CorpusPrep.Config(packTokens = 30L, packBuckets = 2))
    // a (bucket, pack_id) group exists within exactly one split by
    // construction (bucketCol includes split) — verify the attached
    // columns are consistent and n_tokens is positive
    val bad = out.groupBy("split", "bucket", "pack_id")
      .agg(countDistinct("split").as("ns"))
      .where(col("ns") > 1).count()
    assert(bad == 0L)
    assert(out.where(col("n_tokens") <= 0).count() == 0L)
  }

  test("prepareFull: decontamination drops benchmark overlaps; DSIR caps size") {
    // benchmark = two corpus docs' texts verbatim → those docs must be
    // dropped (100% n-gram overlap); the DSIR cut then caps the output
    val docs = corpus
    val bench = docs.where(col("doc_id").isin(10L, 11L)).select("text")
    val got = CorpusPrep.prepareFull(docs, "doc_id", "text",
        benchmark = Some(bench),
        dsirTarget = Some(length(col("text")) > 40),
        dsirKeep = 20)
    val ids = got.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(10L) && !ids.contains(11L),
      "benchmark-overlapping docs must be decontaminated away")
    assert(ids.size == 20, s"DSIR cut must keep exactly 20, got ${ids.size}")
    // deterministic end to end
    val again = CorpusPrep.prepareFull(docs, "doc_id", "text",
        benchmark = Some(bench),
        dsirTarget = Some(length(col("text")) > 40),
        dsirKeep = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids)
  }

  test("prepareFull splice plan: region list stays distributed (no local relation)") {
    // the scale contract: prepareFull must never materialize the region
    // list on the driver — on 100 TB that list is unbounded. The splice
    // plan's regions side must read the doubling loop's checkpoint
    // (LogicalRDD), never a collected LocalRelation.
    val (spliced, release) =
      CorpusPrep.splicedCorpus(corpus, "doc_id", "text", 8)
    try {
      val nodes = spliced.queryExecution.analyzed.collect { case n => n }
      val localRegionRelations = nodes.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
            if l.output.exists(_.name == "region_len") => l
      }
      assert(localRegionRelations.isEmpty,
        "region list was collected to the driver (LocalRelation in splice plan)")
      // the regions subtree aggregates (start, region_len) on top of the
      // doubling loop's checkpointed position frame (__doc, __off) — that
      // LogicalRDD is the only one in this plan (docs here is a
      // LocalRelation), proving the staged path feeds the splice
      val checkpointedRegions = nodes.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD
            if l.output.exists(_.name == "__off") => l
      }
      assert(checkpointedRegions.nonEmpty,
        "splice plan must read the staged (checkpointed) region frame")
      assert(spliced.count() > 0)
    } finally release()
  }

  test("prepareFull: stage timer fires once per eager stage, in flow order") {
    val stages = scala.collection.mutable.ArrayBuffer.empty[String]
    CorpusPrep.prepareFull(corpus, "doc_id", "text",
      benchmark = Some(corpus.where(col("doc_id") === 10L).select("text")),
      stageTimer = (n, s) => { assert(s >= 0.0); stages += n; () })
      .count()
    assert(stages.toSeq == Seq("detect_regions", "splice_checkpoint",
      "filter_dedup", "decontam_checkpoint"))
  }

  test("prepare: deterministic across runs") {
    val cfg = CorpusPrep.Config()
    def run() = CorpusPrep.prepare(corpus, "doc_id", "text", cfg)
      .select("doc_id", "split", "pack_id")
      .as[(Long, String, Long)].collect().toSet
    assert(run() == run())
  }
}
