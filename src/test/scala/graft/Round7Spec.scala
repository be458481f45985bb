package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-7 behavior pins: the positions-only boilerplate rewrite keeps its
  * contract on the degenerate inputs the old explode-regroup shape dropped
  * (ADVICE r6). */
class Round7Spec extends SparkSuite {
  import spark.implicits._

  test("boilerplate: zero-line and null-lines docs surface with n_kept = 0") {
    val docs = Seq(
      (1L, "nav\nalpha"),
      (2L, "nav\nbeta"),
      (3L, ""),                       // split("") -> [""], df("")=1 -> kept
      (4L, null.asInstanceOf[String]) // split(null) -> null lines array
    ).toDF("id", "text")
    val out = Dedup.boilerplateRemove(docs, "id",
        when(col("text").isNull, lit(null).cast("array<string>"))
          .otherwise(filter(split(col("text"), "\n"), _ =!= "")),
        minDf = 2, sep = "\n")
      .orderBy("id").collect()
    assert(out.length == 4, "every input id must surface")
    assert(out(0).getAs[String]("kept_text") == "alpha")
    assert(out(1).getAs[String]("kept_text") == "beta")
    for (i <- Seq(2, 3)) {
      assert(out(i).getAs[Long]("n_lines") == 0L, s"doc ${i + 1}")
      assert(out(i).getAs[Long]("n_kept") == 0L, s"doc ${i + 1}")
      assert(out(i).getAs[String]("kept_text") == "", s"doc ${i + 1}")
    }
  }
}
