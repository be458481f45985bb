package graft

import org.apache.spark.sql.functions._
import graft.model.QualityClassifier

/** The learned document classifier: featurization correctness, separation
  * on a labeled fixture, and the deployed-scorer contract (score() embeds
  * the coefficients as plan literals — no ML runtime in the scoring path).
  */
class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  private lazy val labeled = Seq(
    // English: heavy marker-token density
    (1L, "the cat is in the house and the dog is of the garden", 1.0),
    (2L, "a view of the sea is that it is calm and blue in the morning", 1.0),
    (3L, "to be or not to be is the question that is asked in the play", 1.0),
    (4L, "the quick brown fox jumps over the lazy dog in a field", 1.0),
    // Spanish
    (5L, "el gato de la casa y los perros en un jardin que es grande", 0.0),
    (6L, "la vista de el mar es que los dias en un verano son azules", 0.0),
    // French
    (7L, "le chat de la maison et les chiens des jardins un une belle", 0.0),
    (8L, "la vue de la mer et le ciel les jours des etes un une", 0.0),
    // German
    (9L, "der hund und die katze das haus ist von den feldern mit der", 0.0),
    (10L, "die sonne ist das licht und der mond von den sternen mit die", 0.0)
  ).toDF("id", "text", "label")

  test("features: marker ratios and alpha ratio are exact") {
    val f = labeled.where($"id" === 1L)
      .select(QualityClassifier.features(col("text")).as("f"))
      .as[Seq[Double]].head()
    assert(f.length == 5)
    // the×4 + is×2 + in + and + of = 9 en-marker hits / 13 tokens
    assert(math.abs(f.head - 9.0 / 13.0) < 1e-12, s"en ratio ${f.head}")
    assert(f(1) == 0.0 && f(2) == 0.0 && f(3) == 0.0)
    assert(f(4) > 0.7 && f(4) < 0.85) // letters / chars (spaces excluded)
  }

  test("fit separates en from non-en and score() matches the model") {
    val model = QualityClassifier.fit(labeled, "text", "label")
    val scored = QualityClassifier.score(model, labeled, "text")
    val wrong = scored.where(col("pred") =!= col("label")).count()
    assert(wrong == 0, s"misclassified $wrong of 10 fixture docs")
    // the en-marker coefficient must dominate positively
    val w = model.coefficients.toArray
    assert(w.head > 0, s"en-ratio coefficient should be positive: ${w.toSeq}")
    // deployed scorer = plan literals: re-fit and re-score must agree on
    // every decision (convex loss, unique optimum)
    val again = QualityClassifier.score(
      QualityClassifier.fit(labeled, "text", "label"), labeled, "text")
    val diff = scored.select("id", "pred")
      .join(again.select(col("id"), col("pred").as("pred2")), "id")
      .where(col("pred") =!= col("pred2")).count()
    assert(diff == 0)
  }

  test("corpus-scale distillation: recovers a rule label at >= 95%") {
    // The synthetic corpus text is a uniform token soup — its lang column
    // is metadata, not a property of the text, so no classifier can learn
    // it. What CAN be validated at corpus scale is distillation: label by
    // a deterministic rule over the text and assert the distributed
    // fit/score loop recovers it.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("label",
        when(element_at(QualityClassifier.features(col("text")), 1) >= 0.08, 1.0)
          .otherwise(0.0))
    val model = QualityClassifier.fit(docs, "text", "label")
    val scored = QualityClassifier.score(model, docs, "text")
    val total = scored.count().toDouble
    val right = scored.where(col("pred") === col("label")).count().toDouble
    assert(right / total >= 0.95, f"accuracy ${right / total}%.3f < 0.95")
  }
}
