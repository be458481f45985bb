package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface access to the native kernels via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate may return a session created by another suite in this JVM
  // (extensions only apply at construction), so use the programmatic
  // registration path — the one a live session would use anyway.
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("ExtensionsSpec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("native kernels callable from spark.sql") {
    import spark.implicits._
    Seq((Array(1.0f, 0.0f), Array(0.0f, 2.0f), Seq("a", "b")))
      .toDF("x", "y", "toks").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT vector_dot(x, x) AS d, vector_cosine(x, y) AS c,
        |  simhash64(toks) AS sh,
        |  size(shingle_hashes('abcde', 3)) AS ns,
        |  cjk_segment('三体test') AS seg
        |FROM t""".stripMargin).collect().head
    assert(row.getAs[Double]("d") == 1.0)
    assert(row.getAs[Double]("c") == 0.0)
    assert(row.getAs[Int]("ns") == 3)
    assert(row.getAs[scala.collection.Seq[String]]("seg") == Seq("三体", "test"))
  }

  test("cjk_segment_dict: corpus-scale broadcast dictionary reachable from SQL") {
    import spark.implicits._
    // >10k-word lexicon: SQL form must match the function-API broadcast
    // form exactly (same kernel, same broadcast shipping)
    val bigDict = graft.functions.TextFunctions.defaultCjkDict ++
      (0 until 12000).map(i => s"词$i")
    assert(bigDict.size > 10000)
    graft.functions.TextFunctions.SegmentDicts.register(spark, "big", bigDict)
    try {
      val texts = Seq("三体黑暗森林与activity小王子123 测试x",
        "词11999在词典里词99999不在", "战争与和平 百年孤独").toDF("t")
      texts.createOrReplaceTempView("seg_in")
      val viaSql = spark.sql("SELECT cjk_segment_dict(t, 'big') AS s FROM seg_in")
        .as[Seq[String]].collect().toSeq
      implicit val s = spark
      val viaApi = texts.select(
          graft.functions.TextFunctions.segmentBroadcast(col("t"), bigDict))
        .as[Seq[String]].collect().toSeq
      assert(viaSql == viaApi)
      assert(viaSql(1).contains("词11999") && !viaSql(1).contains("词99999"))
      // unknown name fails with a actionable message at plan time
      val err = intercept[Exception] {
        spark.sql("SELECT cjk_segment_dict(t, 'nope') FROM seg_in").collect()
      }
      assert(err.getMessage.contains("no segmentation dictionary"))
    } finally graft.functions.TextFunctions.SegmentDicts.unregister("big")
  }

  test("int8 quantization kernels callable from spark.sql") {
    val row = spark.sql(
      """SELECT int8_cosine(int8_quantize(array(1.0F, 0.0F)),
        |                   int8_quantize(array(1.0F, 0.0F))) AS same,
        |  int8_cosine(int8_quantize(array(1.0F, 0.0F)),
        |              int8_quantize(array(0.0F, 2.0F))) AS orth""".stripMargin)
      .collect().head
    assert(row.getAs[Double]("same") == 1.0)
    assert(row.getAs[Double]("orth") == 0.0)
  }

  test("bpe_tokenize: literal merge table reachable from SQL") {
    val got = spark.sql(
      "SELECT bpe_tokenize('lower low', 'l o|lo w|e r') AS toks")
      .collect().head.getSeq[String](0)
    assert(got == Seq("low", "er", "low"))
    val err = intercept[Exception] {
      spark.sql("SELECT bpe_tokenize('x', 'bad merge spec here')").collect()
    }
    assert(err.getMessage.contains("left right"))
    // a non-literal merge argument must fail with the descriptive error,
    // not an unresolved-expression / ClassCastException from builder eval
    val nonLit = intercept[Exception] {
      spark.sql("SELECT bpe_tokenize(t, t) FROM VALUES ('x') AS v(t)").collect()
    }
    assert(nonLit.getMessage.contains("LITERAL"), nonLit.getMessage)
  }

  test("set and media kernels callable from spark.sql") {
    val row = spark.sql(
      """SELECT intersection_size(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS i,
        |  wav_features(CAST('junk' AS BINARY)) AS w,
        |  bmp_features(CAST('junk' AS BINARY)) AS b""".stripMargin)
      .collect().head
    assert(row.getAs[Int]("i") == 2)
    assert(row.isNullAt(1) && row.isNullAt(2))   // malformed → null, no throw
  }

  test("char_entropy: hand-computed distributions, surrogate pairs, empty") {
    val rows = spark.sql(
      """SELECT char_entropy('aaaa') AS zero, char_entropy('ab') AS one_bit,
        |  char_entropy('aabb') AS one_bit2, char_entropy('') AS empty,
        |  char_entropy('😀😀') AS emoji""".stripMargin).collect().head
    assert(rows.getDouble(0) == 0.0)                       // single symbol
    assert(math.abs(rows.getDouble(1) - math.log(2)) < 1e-12)   // uniform/2
    assert(math.abs(rows.getDouble(2) - math.log(2)) < 1e-12)
    assert(rows.getDouble(3) == 0.0)                       // empty → 0
    // one distinct CODE POINT (not two surrogate chars): entropy 0
    assert(rows.getDouble(4) == 0.0)
  }
}
