package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Scale rehearsal for [[graft.jobs.DedupIngestJob]]: seed the index with
  * half the N× corpus, then stream the other half in day-sized batches
  * and time each micro-batch end-to-end (within-batch dedup → index
  * probe → three writes → index growth). The claim under test: per-batch
  * cost tracks the BATCH (plus colliding buckets), not the accumulated
  * corpus — batch walls should stay ~flat as the index doubles.
  *
  * Usage: DedupIngestScale <dir> [batches=5] */
object DedupIngestScale {
  def main(args: Array[String]): Unit = {
    val srcDir = args.head
    val nBatches = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ids = docs.select(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val mid = lo + (hi - lo) / 2
    val dir = java.nio.file.Files.createTempDirectory("dedupingest").toString
    val seed = docs.where(col("doc_id") <= mid)
    val t0 = System.nanoTime()
    graft.jobs.DedupIngestJob.seed(seed, "doc_id", "text", dir)
    println(f"DEDUPINGEST seed ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"(${seed.count()} docs)")
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    @volatile var lastN = -1L
    val q = graft.jobs.DedupIngestJob.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      trigger = Trigger.ProcessingTime(0L),
      onBatch = (_, n) => lastN = n)
    try {
      val step = math.max(1L, (hi - mid) / nBatches)
      (0 until nBatches).foreach { d =>
        val a = mid + 1 + d * step
        val b = if (d == nBatches - 1) hi + 1 else a + step
        val rows = docs.where(col("doc_id") >= a && col("doc_id") < b)
          .as[(Long, String)].collect().toSeq
        val td = System.nanoTime()
        stream.addData(rows: _*)
        q.processAllAvailable()
        println(f"DEDUPINGEST batch${d + 1} ${(System.nanoTime() - td) / 1e9}%.1f s " +
          s"(in=${rows.size} survivors=$lastN)")
      }
      val total = graft.jobs.DedupIngestJob.survivors(spark, dir).count()
      println(s"DEDUPINGEST total_survivors $total")
    } finally q.stop()
    spark.stop()
  }
}
