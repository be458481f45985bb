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

  /** BM25 ranking of documents against a fixed bag of query terms — the
    * standard retrieval scorer (Robertson/Spärck Jones; the k1/b form used
    * by Lucene), and the usual first-stage ranker a training-data pipeline
    * runs for targeted corpus queries ("find docs about X") before any
    * embedding model. Same declarative corpus-stat shape as [[tfidf]]:
    * df per query term, N and average document length via one broadcast
    * single-row cross join, so the whole score is one pipelined DAG whose
    * only shuffles are partial+final aggregations — no driver action, no
    * per-query rescan of non-matching documents (the query-term semi-join
    * prunes postings first).
    *
    * Formula (documented precisely so the SQL oracle can mirror it):
    *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    *   score(d) = Σ_{t ∈ query} s(d, t)
    * where dl = |tokens(d)| and avgdl averages over ALL docs (including
    * those matching no query term). Docs matching no term are omitted.
    *
    * docs must carry `tokensCol: array<string>`; returns
    * (id, score) for matching docs. */
  def bm25(docs: DataFrame, idCol: String, tokensCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val base = docs.select(col(idCol).as("id"),
      col(tokensCol).as("toks"), size(col(tokensCol)).cast("double").as("dl"))
    val stats = base.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val q = broadcast(
      docs.sparkSession.createDataFrame(queryTerms.distinct.map(Tuple1(_)))
        .toDF("term"))
    val tf = base.select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .join(q, Seq("term"))   // prune postings to query terms BEFORE the agg
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"),
        first(col("dl")).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1.0) /
          (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("id").agg(sum(col("s")).as("score"))
  }
}
