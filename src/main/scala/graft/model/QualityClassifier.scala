package graft.model

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Model-based document classification — the "train a fastText-style
  * quality/language classifier on cheap signals, score the whole corpus"
  * step of an LLM data pipeline (the learned complement of the rule-based
  * t3/t14 filters).
  *
  * Features are engine-native column expressions (marker-token ratios +
  * alphabetic ratio — the same signals the t4 heuristic votes on), so
  * featurization is a codegen'd scan with no UDFs; training is Spark ML
  * logistic regression (distributed L-BFGS: each iteration is one
  * tree-aggregated gradient pass — no data ever collects to the driver,
  * only the coefficient vector, which is fixed-size in the feature count).
  * At 100 TB the fit runs on a bounded SAMPLE (labels are expensive;
  * gradients need shuffled-nothing map passes) and scoring stays a pure
  * projection — both scale paths are the defaults here.
  */
object QualityClassifier {

  private def ratio(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))

  /** Marker-ratio feature vector (en/es/fr/de stopword ratios + alpha
    * ratio) as `array<double>` — shared by fit and score so training and
    * inference cannot skew. */
  def features(text: Column): Column = {
    val toks = TextFunctions.tokenize(lower(text))
    array(
      ratio(toks, Seq("the", "a", "of", "and", "to", "is", "in", "that")),
      ratio(toks, Seq("el", "la", "de", "que", "y", "los", "en", "un")),
      ratio(toks, Seq("le", "la", "de", "et", "les", "des", "un", "une")),
      ratio(toks, Seq("der", "die", "das", "und", "ist", "von", "mit", "den")),
      (length(text) - length(regexp_replace(text, "[a-zA-Z]", ""))).cast("double") /
        greatest(length(text).cast("double"), lit(1.0)))
  }

  /** Fit a binary classifier: `labelCol` must be 0.0/1.0. Deterministic up
    * to float aggregation order (L-BFGS on a convex loss from a fixed
    * init; the optimum is unique, so decisions are stable). */
  def fit(docs: DataFrame, textCol: String, labelCol: String,
          maxIter: Int = 50, regParam: Double = 1e-4): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(true)
      .setFeaturesCol("features").setLabelCol(labelCol)
      .fit(docs.select(col(labelCol),
        array_to_vector(features(col(textCol))).as("features")))

  /** Score: adds `p` (P(label=1)) and `pred` (0/1) columns — a pure
    * projection over the scan (broadcast coefficient dot product). */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            textCol: String): DataFrame = {
    val m = model.coefficients.toArray
    val b = model.intercept
    val f = features(col(textCol))
    val margin = m.zipWithIndex.foldLeft(lit(b)) { case (acc, (w, i)) =>
      acc + element_at(f, i + 1) * lit(w)
    }
    val p = lit(1.0) / (lit(1.0) + exp(-margin))
    docs.withColumn("p", p)
      .withColumn("pred", when(col("p") >= 0.5, 1.0).otherwise(0.0))
  }
}
