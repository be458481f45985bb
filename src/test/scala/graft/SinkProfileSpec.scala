package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Profile}
import graft.io.Sink
import java.nio.file.Files

/** Sink layout/compaction, key-distribution profiling, and chunk-level
  * dedup — hand-computed expectations on small fixtures. */
class SinkProfileSpec extends SparkSuite {

  private def keyed = {
    import spark.implicits._
    (Seq.fill(8)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L)).toDF("k")
  }

  test("keyHistogram buckets per-key counts on log2 boundaries") {
    val rows = Profile.keyHistogram(keyed, col("k")).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ===
      Seq((0L, 2L, 2L, 1L, 1L),    // keys 3,4: cnt 1 -> bucket 0
        (1L, 1L, 2L, 2L, 2L),      // key 2: cnt 2 -> bucket 1
        (3L, 1L, 8L, 8L, 8L)))     // key 1: cnt 8 -> bucket 3
  }

  test("skewStats computes the decision ratios") {
    val r = Profile.skewStats(keyed, col("k")).collect().head
    assert(r.getLong(0) === 4L)                    // n_keys
    assert(r.getLong(1) === 12L)                   // n_rows
    assert(r.getLong(2) === 8L)                    // max_cnt
    assert(r.getDouble(3) === 1.5)                 // p50 of (1,1,2,8)
    assert(math.abs(r.getDouble(5) - 8.0 / 12) < 1e-6)   // top1_share
    assert(math.abs(r.getDouble(6) - 8.0 * 4 / 12) < 1e-4) // skew_ratio
  }

  private def chunkDocs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f"),   // both chunks first occurrences
      (2L, "a b c x y z"),   // first chunk duplicates doc 1's
      (3L, "x y z"),         // whole doc duplicates doc 2's second chunk
      (4L, "p q r p q r")    // WITHIN-doc repetition: second chunk dropped
    ).toDF("doc_id", "text")
  }

  test("chunkDedup keeps global first occurrences and reassembles in order") {
    val out = Dedup.chunkDedup(chunkDocs, "doc_id", "text", chunkTokens = 3)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSeq === Seq(
      (1L, 2L, 2L, "a b c d e f"),
      (2L, 2L, 1L, "x y z"),
      (3L, 1L, 0L, ""),
      (4L, 2L, 1L, "p q r")))
  }

  test("chunkDedup token conservation: kept tokens = chunk-sum of survivors") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 10)
    // every doc appears exactly once, chunk counts bound kept counts
    assert(out.count() === docs.count())
    assert(out.where(col("n_kept") > col("n_chunks")).count() === 0)
    // survivors of a doc with zero kept chunks reassemble to the empty string
    assert(out.where(col("n_kept") === 0 && col("kept_text") =!= "")
      .count() === 0)
  }

  test("writePartitioned lays out hive dirs, bounded files, sorted rows") {
    val dir = Files.createTempDirectory("sink").toFile
    dir.deleteOnExit()
    val path = s"$dir/docs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Sink.writePartitioned(docs, path,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
      filesPerPartition = 2)
    val langs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(langs.nonEmpty)
    langs.foreach { l =>
      val files = new java.io.File(s"$path/$l").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length <= 2, s"$l has ${files.length} files")
    }
    val back = spark.read.parquet(path)
    assert(back.count() === docs.count())
    // same rows (partition col round-trips as a column)
    assert(back.select("doc_id", "text", "lang", "source", "n_chars")
      .exceptAll(docs.select("doc_id", "text", "lang", "source", "n_chars"))
      .count() === 0)
  }

  test("writePartitioned ORC format: same layout contract, pushdown works") {
    val dir = Files.createTempDirectory("sinkorc").toFile
    dir.deleteOnExit()
    val path = s"$dir/docs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Sink.writePartitioned(docs, path,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
      filesPerPartition = 2, format = "orc")
    val langs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(langs.nonEmpty)
    langs.foreach { l =>
      val files = new java.io.File(s"$path/$l").listFiles()
        .filter(_.getName.endsWith(".orc"))
      assert(files.length <= 2 && files.nonEmpty, s"$l layout broken")
    }
    val back = spark.read.orc(path)
    assert(back.count() === docs.count())
    assert(back.select("doc_id", "text").exceptAll(
      docs.select("doc_id", "text")).count() === 0)
    // predicate + partition pruning reach the ORC scan like parquet
    val q = spark.read.orc(path)
      .where(org.apache.spark.sql.functions.col("lang") === "en" &&
        org.apache.spark.sql.functions.col("doc_id") < 100)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)"),
      s"ORC pushdown missing:\n$plan")
    assert(plan.contains("PartitionFilters:") && plan.contains("lang"),
      "partition pruning missing")
  }

  test("compact reduces file count, preserves rows and partition layout") {
    val dir = Files.createTempDirectory("compact").toFile
    dir.deleteOnExit()
    val path = s"$dir/docs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // deliberately fragmented: every lang dir split across ~8 task files
    // (the shape an incremental-append job leaves behind)
    docs.repartition(8).write.partitionBy("lang").parquet(path)
    val report = Sink.compact(spark, path, targetBytes = 1L << 30)
    assert(report.filesBefore > report.filesAfter)
    assert(report.bytes > 0L)
    // partition pruning still works after the swap
    val back = spark.read.parquet(path)
    assert(back.columns.contains("lang"))
    assert(back.count() === docs.count())
    assert(back.select("doc_id", "text", "lang", "source", "n_chars")
      .exceptAll(docs.select("doc_id", "text", "lang", "source", "n_chars"))
      .count() === 0)
    // idempotent: a second pass keeps the same (already compact) shape
    val again = Sink.compact(spark, path, targetBytes = 1L << 30)
    assert(again.filesAfter === report.filesAfter)
  }
}
