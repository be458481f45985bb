package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Dedup}

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

  // ---- Decontaminate.semantic: broadcast vs IVF route ----------------------

  /** Embeddings from the real testdata + a 5-vector benchmark drawn from
    * it: the IVF route (forced by maxBroadcastRows = 0) must keep exactly
    * the same survivors as the exact broadcast scan when it probes every
    * cell (nProbe = nCentroids ⇒ recall is complete by construction, so
    * this is an EQUALITY check, not a recall bound). */
  test("semantic decontam: IVF route with full probe equals the broadcast scan") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bench = emb.where(col("vec_id") % 97 === 0).select(col("embedding"))
    val exact = Decontaminate.semantic(emb, "vec_id", "embedding",
        bench, "embedding", minCosine = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Decontaminate.semantic(emb, "vec_id", "embedding",
        bench, "embedding", minCosine = 0.35,
        maxBroadcastRows = 0L, nCentroids = 4, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exact == ivf,
      s"IVF-only=${ivf.diff(exact)} exact-only=${exact.diff(ivf)}")
    assert(exact.size < emb.count(), "fixture must actually drop something")
  }

  test("semantic decontam: empty benchmark keeps the whole corpus on both routes") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val none = emb.where(lit(false)).select(col("embedding"))
    for (mbr <- Seq(2000000L, 0L)) {
      val out = Decontaminate.semantic(emb, "vec_id", "embedding",
        none, "embedding", minCosine = 0.35, maxBroadcastRows = mbr)
      assert(out.count() == emb.count())
    }
  }
}
