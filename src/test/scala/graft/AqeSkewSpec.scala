package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE's runtime skew-join handling is one of the two skew answers this
  * engine relies on (the other is explicit salting, `operators/Skew`).
  * SCALING.md claims AQE splits skewed partitions at runtime — this spec
  * pins that the claim is true under this session's configs, by building a
  * join where one key holds ~99% of the rows and asserting the FINAL
  * adaptive plan marked the sort-merge join as skew-handled. */
class AqeSkewSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",     // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries 100k fat fact rows; 31 other keys carry 50 each —
      // one shuffle partition dwarfs the median by orders of magnitude
      val facts = spark.range(0, 100000).select(
          lit(0L).as("k"), col("id"),
          concat_ws("", Seq.fill(64)(col("id").cast("string")): _*).as("pad"))
        .union(spark.range(0, 1550).select(
          (col("id") % 31 + 1).as("k"), col("id"),
          col("id").cast("string").as("pad")))
      val dims = (0L to 31L).map(k => (k, s"d$k")).toDF("k", "name")
        .repartition(4)   // non-broadcastable shape is forced by conf anyway
      // collect() (not count()) so the SAME QueryExecution we inspect is
      // the one that ran — count() wraps the join in a separate agg plan
      // whose adaptive root would be the executed one
      val joined = facts.join(dims, Seq("k")).select("k", "name")
      assert(joined.collect().length == 101550)
      val exec = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(exec.isDefined, "expected an adaptive plan root")
      val finalPlan = exec.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join as skew-handled:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
