package graft

import graft.operators.Ann

/** Pins the rank-width contract (r8): both all-pairs ANN lanes end in an
  * explicit NUMBERED repartition on the window key, so the expensive
  * per-row rank stage (sort + HALF_UP rounding over the full candidate
  * set) always runs at the configured shuffle width — AQE's byte-sized
  * coalescing fused the skinny (ids, cosine) exchange into a SINGLE task
  * before the fix (the bimodal ~2 s / ~30 s walls in SCALING.md's r8 ANN
  * rehearsal). Observed behaviorally: on a tiny corpus AQE would coalesce
  * an unpinned rank stage to one partition, so the materialized result
  * holding the window's output partitioning at exactly
  * `spark.sql.shuffle.partitions` is the discriminating signal. */
class RankWidthSpec extends SparkSuite {

  private def width: Int = spark.sessionState.conf.numShufflePartitions

  test("ivfTopK's rank stage keeps full shuffle width under AQE") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Ann.ivfTopK(emb, "vec_id", "embedding", k = 3,
      nCentroids = 8, nProbe = 2)
    try assert(out.rdd.getNumPartitions == width,
      s"ivfTopK rank stage ran at ${out.rdd.getNumPartitions} partitions " +
        s"(want $width) — AQE fused the skinny candidate exchange again")
    finally out.unpersist(true)
  }

  test("lshTopK's rank stage keeps full shuffle width under AQE") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Ann.lshTopK(emb, "vec_id", "embedding", k = 3, dim = 64)
    try assert(out.rdd.getNumPartitions == width,
      s"lshTopK rank stage ran at ${out.rdd.getNumPartitions} partitions " +
        s"(want $width) — AQE fused the skinny candidate exchange again")
    finally out.unpersist(true)
  }
}
