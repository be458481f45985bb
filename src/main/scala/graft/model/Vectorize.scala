package graft.model

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, StopWordsRemover}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Count-vectorization of documents (SURVEY §2.4 A10/A11).
  *
  * Reference (guessLike_u_like.py:72-75): sklearn
  * `CountVectorizer(min_df=10, stop_words=<1,893 entries>)` over user
  * documents (the log pipeline omits stop words — log_analyze.py:126 — a
  * real divergence the caller controls via `stopWords = Nil`).
  *
  * Spark ML: tokenize (same `\s+` split as the corpus prep) →
  * `StopWordsRemover` → `CountVectorizer().setMinDF(minDf)`. Fit produces a
  * vocab-pruned model whose transform emits `ml.linalg.SparseVector`s —
  * distributed, unlike the reference's in-memory scipy CSR.
  */
object Vectorize {

  final case class Fitted(model: CountVectorizerModel, vectors: DataFrame)

  /** docs(keyCol, docCol) → vectors(keyCol, tokens, vec). */
  def fit(docs: DataFrame, keyCol: String, docCol: String,
          minDf: Double = 10.0, stopWords: Seq[String] = Nil,
          vocabSize: Int = 1 << 18): Fitted = {
    val tokenized = docs.select(col(keyCol),
      TextFunctions.tokenize(col(docCol)).as("rawTokens"))
    val filtered =
      if (stopWords.nonEmpty) {
        new StopWordsRemover()
          .setInputCol("rawTokens").setOutputCol("tokens")
          .setStopWords(stopWords.toArray)
          .transform(tokenized)
      } else tokenized.withColumn("tokens", col("rawTokens"))
    val cv = new CountVectorizer()
      .setInputCol("tokens").setOutputCol("vec")
      .setMinDF(minDf).setVocabSize(vocabSize)
    val model = cv.fit(filtered)
    Fitted(model, model.transform(filtered).select(keyCol, "tokens", "vec"))
  }

  /** Default stop words bundled with the engine (a compact analogue of the
    * reference's stop_word.txt — CJK punctuation + common function words). */
  val defaultStopWords: Seq[String] = Seq(
    "的", "了", "和", "是", "在", "我", "有", "他", "这", "中", "，", "。",
    "、", "：", "；", "！", "？", "（", "）", "《", "》",
    "the", "a", "an", "of", "to", "in", "and", "is", "on", "for", "with")
}
