package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev instrumentation: stage-by-stage timing of the d5 dedupCorpus path. */
object DebugD5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"D5STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = graft.operators.Dedup.minHashLsh(docs, "doc_id", "text",
      shingleN = 3, bands = 12, rows = 8, minJaccard = 0.8, maxBucket = 200L)
    time("pairs.count")(println("pairs=" + pairs.count()))
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("edges.count")(println("edges=" + edges.count()))
    time("edges.count2")(println("edges=" + edges.count()))
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("canonical", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println("LABELS PLAN: " +
      labels.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("InMemory") || l.contains("Scan parquet") ||
          l.contains("Exchange")).mkString(" | "))
    time("labels.count")(println("labels=" + labels.count()))
    time("labels.count2")(println("labels=" + labels.count()))
    var cached = labels
    var i = 0
    var converged = false
    while (i < 5 && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("canonical", "nc"), "b")
        .groupBy(col("a").as("id")).agg(min(col("nc")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("canonical").as("prev"),
          least(col("canonical"), coalesce(col("nmin"), col("canonical"))).as("canonical"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      converged = time(s"round$i.count")(
        updated.where(col("prev") =!= col("canonical")).count() == 0L)
      cached.unpersist()
      cached = updated
      labels = updated.select("id", "canonical")
      i += 1
    }
    time("final.antijoin") {
      val losers = labels.where(col("id") =!= col("canonical"))
        .select(col("id").as("doc_id"))
      println("survivors=" + docs.join(losers, Seq("doc_id"), "left_anti").count())
    }
    spark.stop()
  }
}
