package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-rehearsal timer for the suffix-array pass over the FULL corpus
  * (the d14 gate query pins a fixed doc_id slice, so it cannot measure
  * corpus scaling — this times `duplicatedRegionsStaged` end to end at
  * whatever corpus the dir holds). Mirrors TimeOne's protocol: cold
  * cache, warm JVM, 3 timed runs. */
object SuffixScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, args.head)
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val staged = graft.operators.SuffixDedup.duplicatedRegionsStaged(
        docs, "doc_id", "text", minLength = 64)
      val n = staged.df.count()
      staged.release()
      println(f"TIMING d14full_suffix run$i ${(System.nanoTime() - t0) / 1e9}%.2f s regions=$n")
    }
    spark.stop()
  }
}
