package graft

import org.apache.spark.sql.functions._

/** LevenshteinLengthPrune optimizer rule: adds the pigeonhole prune,
  * changes no results, reaches a fixpoint. Inputs come from parquet —
  * literal relations would be constant-folded straight through the
  * filter, leaving nothing to inspect. */
class RuleSpec extends SparkSuite {
  import spark.implicits._

  GraftExtensions.register(spark)

  private lazy val pairsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("rulespec").toFile
    dir.deleteOnExit()
    val p = s"$dir/pairs"
    Seq(("abc", "abd"), ("abc", "abcdefgh"), ("x", "y"), ("same", "same"))
      .toDF("a", "b").write.mode("overwrite").parquet(p)
    p
  }
  private def pairs = spark.read.parquet(pairsPath)

  test("filter gains the length prune ahead of the DP; results unchanged") {
    val df = pairs.where(levenshtein(col("a"), col("b")) <= 2)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs((length(a") && opt.contains("levenshtein"),
      s"expected the pigeonhole conjunct:\n$opt")
    // prune must come FIRST in the And chain (short-circuits the DP)
    assert(opt.indexOf("abs((length(") < opt.indexOf("levenshtein("),
      s"prune must precede the DP predicate:\n$opt")
    val got = df.as[(String, String)].collect().toSet
    assert(got == Set(("abc", "abd"), ("x", "y"), ("same", "same")))
  }

  test("idempotent: exactly one prune conjunct after repeated optimization") {
    val df = pairs.where(levenshtein(col("a"), col("b")) < 2)
    val opt = graft.plans.LevenshteinLengthPrune(
      graft.plans.LevenshteinLengthPrune(df.queryExecution.optimizedPlan))
    val n = "abs\\(\\(length\\(".r.findAllIn(opt.toString).size
    assert(n == 1, s"expected exactly one prune, got $n:\n$opt")
  }

  test("join conditions are augmented too") {
    val l = pairs.select(col("a"))
    val r = pairs.select(col("b"))
    val j = l.join(r, levenshtein(col("a"), col("b")) <= 1)
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs((length("), s"join condition not augmented:\n$opt")
    // abc×abd (two abc rows), x×y, same×same
    assert(j.count() == 4)
  }

  test("OR-nested predicates are left alone (unsound to augment)") {
    val df = pairs.where(
      levenshtein(col("a"), col("b")) <= 1 || col("a") === "abc")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("abs((length("),
      s"must not augment under OR:\n$opt")
    val got = df.as[(String, String)].collect().toSet
    assert(got == Set(("abc", "abd"), ("abc", "abcdefgh"),
      ("x", "y"), ("same", "same")))
  }
}
