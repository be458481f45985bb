package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.model.{Clustering, HotBooks, Vectorize}
import graft.prep.{Collections, Documents, TagWeighting}

/** The shared model pipeline (SURVEY §0, duplicated verbatim in the
  * reference across LOG/ULK/UNL/UFS): relational preprocessing → count
  * vectorization → k-means user clustering → per-cluster neighbor corpus →
  * hot-book popularity list.
  *
  * Fit once as a batch job; the fitted artifacts are DataFrames + small ML
  * models, broadcastable into the streaming serve job (ST4: the reference
  * fits at service startup and never refreshes — refresh here = re-run the
  * fit and swap).
  */
object RecommenderModel {

  final case class Fitted(
      bookDocs: DataFrame,      // (bookId, title, rating, doc)
      userBooks: DataFrame,     // (userId, books array)
      userTokens: DataFrame,    // (userId, cluster, tokens array)
      cv: org.apache.spark.ml.feature.CountVectorizerModel,
      km: org.apache.spark.ml.clustering.KMeansModel,
      hot: DataFrame)           // (bookId, cnt)

  /** Fit over the collection tables (guessLike_u_like.py:39-104). */
  def fit(book: DataFrame, tag: DataFrame, bookTag: DataFrame,
          collect: DataFrame, minCollected: Int = 15, minDf: Double = 10.0,
          stopWords: Seq[String] = Vectorize.defaultStopWords, k: Int = 10,
          hotN: Int = 30, seed: Long = 42L): Fitted = {
    val tagDocs = TagWeighting.weightedTagDocs(bookTag, tag)
    val bookDocs = Documents.bookDocs(book, tagDocs)
    val userBooks = Collections.userBookLists(collect, minCollected)
    val userDocs = Collections.userDocs(userBooks, bookDocs)
    val vec = Vectorize.fit(userDocs, "userId", "userDoc", minDf, stopWords)
    val clusters = Clustering.fit(vec.vectors, "userId", k, seed)
    val userTokens = vec.vectors
      .join(clusters.assignments, "userId")
      .select(col("userId"), col("cluster"), col("tokens"))
    val hot = HotBooks.hot(userBooks, hotN)
    Fitted(bookDocs, userBooks, userTokens, vec.model, clusters.model, hot)
  }

  /** ST4 persistence: the fitted artifacts round-trip to a directory (ML
    * writers for the models, parquet for the DataFrames), so a serving job
    * can load + broadcast without refitting; model refresh = re-run fit,
    * save, resubmit serve (the reference refits on process restart,
    * guessLike_u_like.py:163-176). */
  def save(fitted: Fitted, dir: String): Unit = {
    fitted.cv.write.overwrite().save(s"$dir/cv")
    fitted.km.write.overwrite().save(s"$dir/km")
    fitted.bookDocs.write.mode("overwrite").parquet(s"$dir/bookDocs")
    fitted.userBooks.write.mode("overwrite").parquet(s"$dir/userBooks")
    fitted.userTokens.write.mode("overwrite").parquet(s"$dir/userTokens")
    fitted.hot.write.mode("overwrite").parquet(s"$dir/hot")
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Fitted =
    Fitted(
      bookDocs = spark.read.parquet(s"$dir/bookDocs"),
      userBooks = spark.read.parquet(s"$dir/userBooks"),
      userTokens = spark.read.parquet(s"$dir/userTokens"),
      cv = org.apache.spark.ml.feature.CountVectorizerModel.load(s"$dir/cv"),
      km = org.apache.spark.ml.clustering.KMeansModel.load(s"$dir/km"),
      hot = spark.read.parquet(s"$dir/hot"))

  /** Assign cluster + vocab-filtered tokens to ad-hoc query users given
    * their doc text — the serving-time `predict` path
    * (guessLike_u_like.py:111). queryDocs: (userId, userDoc). */
  def assignQueries(fitted: Fitted, queryDocs: DataFrame): DataFrame = {
    val tokenized = queryDocs.select(col("userId"),
      TextFunctions.tokenize(col("userDoc")).as("tokens"))
    // operate on defensive copies: setting IO columns on the shared fitted
    // models would mutate `Fitted` in place and race if two scoring paths
    // (e.g. concurrent streaming queries over one loaded model) rewire
    // columns at once — ST4's immutability contract
    val cv = fitted.cv.copy(org.apache.spark.ml.param.ParamMap.empty)
    val km = fitted.km.copy(org.apache.spark.ml.param.ParamMap.empty)
    val withVec = cv.setInputCol("tokens").setOutputCol("vec")
      .transform(tokenized)
    val clustered = km.setFeaturesCol("vec").setPredictionCol("cluster")
      .transform(withVec)
    clustered.select(col("userId"), col("cluster"), col("tokens"))
  }
}
