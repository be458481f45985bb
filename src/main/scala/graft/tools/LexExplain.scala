package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of the lexical index's
  * SERVING query ([[graft.jobs.LexIngestJob.query]]) against an on-disk
  * index — the plan the r14 sidecar/denormalization work is judged on
  * (no docs-component scan may appear). Usage: LexExplain <indexDir>
  * <term> [term...] */
object LexExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val terms = args.tail.toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.jobs.LexIngestJob.query(spark, dir, terms).explain("formatted")
    spark.stop()
  }
}
