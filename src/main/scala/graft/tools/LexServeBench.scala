package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The lexical index's reason to exist, measured: serving a BM25 query
  * OFF THE INDEX (pushed term pruning over term-clustered postings +
  * the skinny doc-length component) versus recomputing it from the raw
  * documents (tokenize → explode → aggregate the whole corpus, the
  * t15-shaped plan — and the reference's shape, which rebuilds its
  * in-memory similarity matrix from the documents on every deploy).
  * Same scores by construction (LexStreamSpec pins exactness); this
  * harness prices the difference at scale.
  *
  * Usage: LexServeBench <corpusDir> <indexDir> [queries=10]
  * where indexDir holds a LexIngestJob index over corpusDir's
  * documents.parquet (e.g. a LexIngestScale leftover). Prints one
  * LEXBENCH line: median wall per query for each path. */
object LexServeBench {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val indexDir = args(1)
    val nQueries = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenize(col("text")).as("toks"))
    // rotating 3-term queries drawn from the corpus frequency head —
    // the same shape the serve harness runs
    val terms = docs.select(explode(col("toks")).as("term"))
      .groupBy("term").count().orderBy(desc("count"), col("term"))
      .limit(3 * nQueries).select("term").as[String].collect()
      .grouped(3).toSeq
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // warm both paths once (codegen + FS metadata), then measure
    graft.jobs.LexIngestJob.query(spark, indexDir, terms.head).count()
    graft.operators.TfIdf.bm25(docs, "doc_id", "toks", terms.head).count()
    val idx = terms.map(t => time {
      graft.jobs.LexIngestJob.query(spark, indexDir, t)
        .orderBy(desc("score"), col("id")).limit(10).collect(); () })
    val raw = terms.map(t => time {
      graft.operators.TfIdf.bm25(docs, "doc_id", "toks", t)
        .orderBy(desc("score"), col("id")).limit(10).collect(); () })
    println(f"LEXBENCH queries=${terms.size} " +
      f"index_p50=${median(idx)}%.2f raw_p50=${median(raw)}%.2f " +
      f"speedup=${median(raw) / median(idx)}%.1fx")
    spark.stop()
  }
}
