package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned anti-join: exclude a key set from a huge table at scan
  * speed.
  *
  * The plain `left_anti` join shuffles EVERY left row on the key — at
  * 100 TB that is the whole corpus through the wire to discard a sliver.
  * With a Bloom filter of the right-side keys broadcast to the scan,
  * definite non-members (the overwhelming majority when the exclusion set
  * is small) pass WITHOUT entering any shuffle; only possible members
  * (true members + ~fpp of the rest) take the exact anti-join path. False
  * negatives are impossible, so the union is exactly the anti-join result,
  * row multiplicity included.
  *
  * This is the engine-level form of the runtime row-group filtering Spark
  * applies to shuffle joins (InjectRuntimeFilter) — made explicit so it
  * also works across separately-planned stages (e.g. a precomputed loser
  * list from [[Dedup.dedupCorpus]] applied to a different table). */
object BloomPrune {

  /** Membership column against a Bloom filter built from `keys` (one
    * distributed pass; ~1.2 bytes/key at fpp=0.03). */
  def mightContain(keys: DataFrame, keyCol: String, probe: Column,
                   expectedItems: Long, fpp: Double): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = keys.sparkSession.sparkContext.broadcast(bf)
    column(graft.expressions.BloomMightContain(expression(probe), bc))
  }

  /** `big` anti-join `exclude` on `key`, Bloom-pruned. `expectedItems`
    * sizes the filter (overshoot is safe — fpp degrades gracefully). */
  def antiJoin(big: DataFrame, exclude: DataFrame, key: String,
               expectedItems: Long = 1L << 20, fpp: Double = 0.03): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1), got $expectedItems / $fpp")
    // NULL keys never match an equi-join key, so a plain left_anti KEEPS
    // them — coalesce routes them to the no-shuffle branch (a bare
    // where(!probe) would evaluate NULL and silently drop the row from
    // both branches)
    val probe = coalesce(
      mightContain(exclude, key, col(key), expectedItems, fpp), lit(false))
    val definiteNo = big.where(!probe)
    val maybe = big.where(probe)
      .join(exclude.select(col(key)).distinct(), Seq(key), "left_anti")
    definiteNo.unionByName(maybe)
  }
}
