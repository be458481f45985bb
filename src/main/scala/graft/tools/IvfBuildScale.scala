package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** A/B harness for the r11 IVF assignment-shuffle sizing: times
  * `Ann.buildIvfIndex` (the posting build whose window shuffle is
  * ∝ vectors × centroids) on an N× embeddings replica, printing the
  * TimeOne-style task/GC/spill/shuffle columns per run. The knob under
  * test is in-plan (`assignCells` repartition from plan-stats × centroid
  * count, floor = session setting); force the OFF arm with
  *   set run/javaOptions += "-Dgraft.tuning.targetPartitionBytes=1152921504606846976"
  * (estimate never clears the floor) and the ON arm with the default.
  *
  * Usage: IvfBuildScale <embDir> [nCentroids=sqrt(n)] [runs=3]
  * Protocol: fresh index dir per run, cold cache, warm JVM — one JVM per
  * arm (run the two arms as separate sbt invocations). */
object IvfBuildScale {
  def main(args: Array[String]): Unit = {
    val embDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var taskTime = 0L; @volatile var gcTime = 0L
    @volatile var spill = 0L; @volatile var shufWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskTime += m.executorRunTime; gcTime += m.jvmGCTime
          spill += m.memoryBytesSpilled + m.diskBytesSpilled
          shufWrite += m.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
    val n = emb.count()
    val nCents = if (args.length > 1) args(1).toInt
      else math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val runs = if (args.length > 2) args(2).toInt else 3
    val target = sys.props.getOrElse("graft.tuning.targetPartitionBytes",
      "default(64MB)")
    println(s"== $n vectors, nCentroids=$nCents, targetPartitionBytes=$target ==")
    (1 to runs).foreach { i =>
      spark.catalog.clearCache(); System.gc()
      val dir = java.nio.file.Files.createTempDirectory("ivfbuild").toString
      val (t0m, g0, s0, w0) = (taskTime, gcTime, spill, shufWrite)
      val t0 = System.nanoTime()
      graft.operators.Ann.buildIvfIndex(emb, "vec_id", "embedding", dir,
        nCentroids = nCents, seed = 42L, distributedFit = true)
      // drain async task-end delivery before the snapshot (the same skew
      // BenchServe fixes via the bridge — late events would land on the
      // NEXT run's columns)
      org.apache.spark.graftbridge.ListenerBridge.drain(
        spark.sparkContext, 10000L)
      println(f"TIMING ivf_build run$i ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"[task ${(taskTime - t0m) / 1e3}%.0f s gc ${(gcTime - g0) / 1e3}%.0f s " +
        f"spill ${(spill - s0) / 1e6} MB shufWrite ${(shufWrite - w0) / 1e6} MB]")
      // the A/B must compare identical results, not just walls — and the
      // FILE count is the write-cost driver (a dynamic-partition write
      // opens a parquet file per (task, cell) pair it sees)
      val gdir = graft.operators.Ann.resolveIvfDir(spark, dir)
      val cells = spark.read.parquet(s"$gdir/postings.parquet")
        .groupBy("cell").count().count()
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(gdir, "postings.parquet"))
      val files = try walk.filter(p => p.toString.endsWith(".parquet")).count()
        finally walk.close() // Files.walk holds open directory handles
      println(s"  cells=$cells files=$files")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    spark.stop()
  }
}
