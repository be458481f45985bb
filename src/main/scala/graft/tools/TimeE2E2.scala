package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, SparkEntry}

/** Stage-by-stage timing of e2e2_full_prep's composed DAG — dev diagnosis
  * for the e2e2 bench variance (runs swing 44 s ↔ 177 s at sf0.1). */
object TimeE2E2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { i =>
      println(s"=== iteration $i ===")
      spark.catalog.clearCache(); System.gc()
      val docs = Tables.documents(spark, sfDir).where(col("doc_id") >= 3)
      val bench = Tables.documents(spark, sfDir).where(col("doc_id") < 3)
        .select(col("text"))
      val regions = t("regions") {
        val r = graft.operators.SuffixDedup.duplicatedRegions(
          docs, "doc_id", "text", 64)
        r.count(); r
      }
      val spliced = t("splice+ckpt") {
        graft.operators.SuffixDedup.removeRegions(
          docs, regions, "doc_id", "text").localCheckpoint(true)
      }
      val base = t("prepare") {
        val b = graft.jobs.CorpusPrep.prepare(spliced, "doc_id", "text")
        b.count(); b
      }
      val decon = t("decontam+ckpt") {
        graft.operators.Decontaminate.decontaminate(base, bench, "text", n = 20)
          .localCheckpoint(true)
      }
      val weights = t("dsir_weights") {
        val w = graft.operators.Dsir.importanceWeights(
          decon.withColumn("__toks",
            graft.functions.TextFunctions.tokenize(lower(col("text")))),
          "doc_id", graft.operators.Dsir.unigramBigram(col("__toks")),
          col("lang") === "en", 1 << 16)
        w.count(); w
      }
      t("resample+join+agg") {
        val u = (pmod(xxhash64(col("doc_id"), lit(42L)),
          lit(1L << 52)) + 0.5) / lit((1L << 52).toDouble)
        val selected = graft.operators.Dsir.resampleTopK(
          weights, "doc_id", "logw", u, 200)
        decon.join(selected.select(col("doc_id")), Seq("doc_id"))
          .groupBy("split").agg(count(lit(1)).as("n"),
            sum(col("n_tokens")).as("n_tokens"))
          .orderBy("split").count()
      }
    }
    spark.stop()
  }
}
