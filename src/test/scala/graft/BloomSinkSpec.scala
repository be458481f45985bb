package graft

import org.apache.spark.sql.functions._
import graft.io.Sink

/** Parquet bloom-filter sink: a point predicate on a scattered
  * high-cardinality id must READ fewer rows from a bloom-filtered layout
  * than from a plain one. The fixture is built so no other pruning can
  * claim the credit: ids are xxhash64-scattered (every file's min/max
  * spans the whole domain → stats prune nothing) and each file holds 300k
  * distinct longs (dictionary encoding falls back to plain past the 1MB
  * dict-page bound → dictionary row-group filtering unavailable). Bloom is
  * then the only way to skip — exactly the production case it exists for. */
class BloomSinkSpec extends SparkSuite {

  test("point lookup reads fewer rows with bloom filters than without") {
    val n = 2400000L
    val df = spark.range(n).select(xxhash64(col("id")).as("id"))
      .repartition(8)
    val target = spark.range(1).select(xxhash64(lit(12345L))).collect()
      .head.getLong(0)

    val bloomDir = java.nio.file.Files.createTempDirectory("bloom").toString
    val plainDir = java.nio.file.Files.createTempDirectory("plain").toString
    Sink.writeWithBloom(df, bloomDir, Seq("id"), expectedNdv = 300000L)
    df.write.mode("overwrite").parquet(plainDir)

    def rowsRead(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir).where(col("id") === target)
      val plan = q.queryExecution.executedPlan
      val hits = plan.executeCollect().length.toLong
      (hits, plan.collectLeaves().head.metrics("numOutputRows").value)
    }
    val (bloomHits, bloomRows) = rowsRead(bloomDir)
    val (plainHits, plainRows) = rowsRead(plainDir)
    assert(bloomHits == 1L && plainHits == 1L)   // correctness first
    assert(plainRows >= n / 2,
      s"control must be unprunable (stats/dict would invalidate the test): $plainRows")
    assert(bloomRows <= plainRows / 4,
      s"bloom should skip most row groups: $bloomRows vs $plainRows")
  }
}
