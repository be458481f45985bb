package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.recommendation.ALSModel
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.DataFrame

/** Bridge into MLlib's `private[ml]` [[ALSModel]] constructor: build a
  * model from EXPLICIT factor matrices instead of a fit. Two uses:
  *
  *  - value-checking: the serving surface (`recommendForUserSubset`'s
  *    blocked factor cross-product) becomes SQL-replayable once the
  *    factors are pinned — the fit is the only non-deterministic stage
  *    (`ml2b_als_fixed_factors`);
  *  - factor import: a 100 TB deployment refits offline on a schedule and
  *    serves from persisted factor tables; this is the load path (the
  *    MLWriter/MLReader round-trip goes through the same constructor).
  *
  * Mirrors [[org.apache.spark.sql.graftbridge.ColumnBridge]]: one
  * constructor call, the minimal internal surface. */
object AlsBridge {

  /** `userFactors` / `itemFactors`: (id: int, features: array<float>),
    * every features array exactly `rank` long. */
  def model(rank: Int, userFactors: DataFrame,
            itemFactors: DataFrame): ALSModel = {
    val m = new ALSModel(Identifiable.randomUID("graft_als"), rank,
      userFactors, itemFactors)
    // a fit()-produced model inherits these from the estimator; a
    // constructed one must set them (userCol/itemCol have no default)
    m.set(m.userCol, "user").set(m.itemCol, "item")
      .setColdStartStrategy("drop")
  }
}
