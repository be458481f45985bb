package graft

import org.apache.spark.sql.functions._
import graft.io.Sink

/** Bucketed tables must deliver the property they exist for: equi-joins and
  * aggregations on the bucket key run WITHOUT a shuffle (the write-side
  * shuffle already happened, once). Asserted against the physical plan, so
  * a config or API regression that silently reintroduces the Exchange fails
  * here instead of on a cluster. */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  private def withBucketedTables(f: => Unit): Unit = {
    val facts = (1L to 1000L).map(i => (i % 100, i, (i * 7 % 50).toDouble))
      .toDF("k", "id", "v")
    val dims = (0L until 100L).map(i => (i, s"dim_$i")).toDF("k", "name")
    Sink.writeBucketedTable(facts, "bspec_facts", buckets = 8,
      bucketCols = Seq("k"), sortCols = Seq("k"))
    Sink.writeBucketedTable(dims, "bspec_dims", buckets = 8,
      bucketCols = Seq("k"), sortCols = Seq("k"))
    try f
    finally {
      spark.sql("DROP TABLE IF EXISTS bspec_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_dims")
    }
  }

  test("co-bucketed equi-join plans SortMergeJoin with zero Exchange") {
    withBucketedTables {
      // force the join strategy that would normally shuffle both sides
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bspec_facts")
          .join(spark.table("bspec_dims"), Seq("k"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"),
          s"co-bucketed join should not shuffle either side:\n$plan")
        // and it still computes the right thing
        assert(joined.count() == 1000L)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("aggregation on the bucket key plans zero Exchange") {
    withBucketedTables {
      val agg = spark.table("bspec_facts").groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key should reuse the write-side distribution:\n$plan")
      assert(agg.count() == 100L)
    }
  }

  test("join on a NON-bucket key still shuffles (the property is key-specific)") {
    withBucketedTables {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val byId = spark.table("bspec_facts").withColumnRenamed("id", "j")
          .join(spark.table("bspec_dims").withColumn("j", col("k") + 1), Seq("j"))
        assert(byId.queryExecution.executedPlan.toString.contains("Exchange"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
