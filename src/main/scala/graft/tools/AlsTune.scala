package graft.tools
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AlsTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val ratings = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").cast("int").as("user"), col("l_partkey").cast("int").as("item"))
      .agg(count(lit(1)).cast("float").as("rating"))
      .localCheckpoint(true)
    for (blocks <- Seq(10, 4, 32); trial <- 1 to 2) {
      val t0 = System.nanoTime()
      val als = new ALS().setRank(8).setMaxIter(5).setSeed(42L).setImplicitPrefs(true)
        .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
        .setUserCol("user").setItemCol("item").setRatingCol("rating")
      val m = als.fit(ratings)
      m.setColdStartStrategy("drop")
      m.recommendForUserSubset(ratings.select("user").distinct(), 5).count()
      println(f"ALSTUNE blocks=$blocks trial=$trial ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
