package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      (1 to 3).foreach { i =>
        spark.catalog.clearCache() // mirror Bench: cold cache, warm JVM
        System.gc() // let ContextCleaner drop prior runs' cached blocks
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, args.head).count()
        println(f"TIMING $n run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
