package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF weighting over a tokenized corpus — the standard upgrade of the
  * reference's raw bag-of-words counts (simility_books.py:60-63 weights
  * terms only by repetition; guessLike_u_like.py's stop-word list is a
  * crude substitute for IDF down-weighting).
  *
  * All statistics are corpus-global and computed declaratively: df and the
  * corpus size N come from aggregations over the same postings, N joins in
  * as a broadcast single-row cross join — no driver-side count, so the
  * whole thing is one DAG Catalyst can pipeline. At 100 TB the shuffles
  * are the (id, term) tf aggregation and the term-keyed df aggregation,
  * both partial+final.
  */
object TfIdf {

  /** (id, term, tf, df, tfidf) with smoothed idf = ln((N+1)/(df+1)) + 1
    * (the scikit-learn "smooth_idf" formulation — never zero, never
    * divides by zero). N counts documents with at least one token. */
  def tfidf(docs: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), explode(col(tokensCol)).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("id")).cast("double").as("n"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("idf",
        log((col("n") + 1.0) / (col("df").cast("double") + 1.0)) + 1.0)
      .withColumn("tfidf", col("tf").cast("double") * col("idf"))
      .select("id", "term", "tf", "df", "tfidf")
  }
}
