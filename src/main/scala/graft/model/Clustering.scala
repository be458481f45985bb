package graft.model

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User clustering (SURVEY §2.4 A12/A8, §4.1 search-space pruning).
  *
  * Reference (guessLike_u_like.py:78-79,170): sklearn KMeans(k=10,
  * k-means++, n_init=1, unseeded) over user count-vectors; similarity
  * indexes are built only for the 10 largest clusters — cluster membership
  * is the reference's search-space pruning, which the engine keeps as an
  * algorithmic design (cluster id becomes a join/partition key).
  *
  * Spark ML KMeans (k-means|| init) with an explicit seed (determinism
  * policy SURVEY §4.2).
  */
object Clustering {

  final case class Fitted(model: KMeansModel, assignments: DataFrame)

  /** vectors(keyCol, vec) → assignments(keyCol, cluster). */
  def fit(vectors: DataFrame, keyCol: String, k: Int = 10,
          seed: Long = 42L): Fitted = {
    val km = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("vec").setPredictionCol("cluster")
    val model = km.fit(vectors)
    Fitted(model, model.transform(vectors).select(col(keyCol), col("cluster")))
  }

  /** A8: the `top` largest clusters by member count
    * (guessLike_u_like.py:170 value_counts()[:10]). */
  def topClusters(assignments: DataFrame, top: Int = 10): DataFrame =
    assignments.groupBy("cluster").agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("cluster").asc)
      .limit(top)
}
