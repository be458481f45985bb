package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-rehearsal corpus generator (VERDICT r6 task 1): writes an N×
  * replica of `<sfDir>/documents.parquet` to `<outDir>/documents.parquet`.
  *
  * Replica i > 0 applies a TOKEN BIJECTION (every whitespace token t →
  * `t_ri`): a bijection preserves every within-replica similarity and
  * duplication relation EXACTLY (exact dups stay exact, n-gram/MinHash
  * Jaccard is invariant under token renaming, suffix-array repeated
  * regions keep their repeat structure) while reducing cross-replica
  * shingle overlap to zero — so the N× corpus has the SAME duplicate-rate
  * character as the 1× corpus, just N× the rows. Naive replication
  * (same text, new ids) would instead plant 10 near-identical copies of
  * every document and measure the dedup *output* explosion, not the
  * engine's scaling.
  *
  * Usage: Scale10x <sfDir> <outDir> [factor=10]
  */
object Scale10x {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val replicas = (0 until factor).map { i =>
      val text =
        if (i == 0) col("text")
        else array_join(
          transform(split(col("text"), "\\s+"), t => concat(t, lit(s"_r$i"))),
          " ")
      docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_.unionAll(_))
    replicas.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")
    println(s"wrote ${factor}x corpus: ${spark.read.parquet(s"$outDir/documents.parquet").count()} docs")
    spark.stop()
  }
}
