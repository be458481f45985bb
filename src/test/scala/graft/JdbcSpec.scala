package graft

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.io.{JdbcUpsert, Sources}

/** Live relational round-trip over embedded Derby (in-memory): the S1–S4
  * JDBC mapping exercised against a real database — reference reads MySQL
  * in simility_books.py:37,45 and guessLike_u_like.py:46-58; the engine's
  * contract is that projection and predicate reach the database as SQL
  * (pushdown), partitioned reads stride the key range, and insert-ignore
  * appends only absent keys. */
class JdbcSpec extends SparkSuite with BeforeAndAfterAll {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def props: Properties = new Properties()

  override def beforeAll(): Unit = {
    super.beforeAll()
    // keep derby.log out of the repo root
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    new java.io.File("/tmp/graft-derby").mkdirs()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE books (
          |  book_id INT PRIMARY KEY,
          |  title VARCHAR(200) NOT NULL,
          |  rating DOUBLE NOT NULL,
          |  tag VARCHAR(50) NOT NULL)""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO books VALUES (?, ?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i)
        ins.setString(2, s"book $i")
        ins.setDouble(3, (i % 5) + 0.5)
        ins.setString(4, s"tag${i % 7}")
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()
  }

  override def afterAll(): Unit = {
    // in-memory Derby drops on the drop=true connection (throws 08006 on
    // success, per Derby's shutdown contract)
    try DriverManager.getConnection("jdbc:derby:memory:graftjdbc;drop=true")
    catch { case _: java.sql.SQLException => () }
    super.afterAll()
  }

  test("S1: full scan round-trips every row and value") {
    val df = Sources.jdbcTable(spark, url, "books", props)
    assert(df.count() == 100)
    val r42 = df.where(col("BOOK_ID") === 42)
      .select("TITLE", "RATING", "TAG").collect().head
    assert(r42.getString(0) == "book 42")
    assert(r42.getDouble(1) == 2.5)
    assert(r42.getString(2) == "tag0")
  }

  test("S1: projection and predicate are pushed into the database") {
    val df = Sources.jdbcTable(spark, url, "books", props)
      .where(col("RATING") > 3.0)
      .select("BOOK_ID", "TITLE")
    val plan = df.queryExecution.executedPlan.toString
    // JDBC v1 scan advertises pushed filters and the pruned column list
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(RATING,3.0)"), plan)
    assert(plan.contains("ReadSchema") || !plan.contains("RATING#"),
      "projection should prune rating from the read schema\n" + plan)
    assert(df.count() == 40)   // ratings 3.5 and 4.5: i%5 ∈ {3,4}
  }

  test("S1: partitioned read strides the key range without changing results") {
    val whole = Sources.jdbcTable(spark, url, "books", props)
      .select("BOOK_ID").as[Int].collect().toSet
    val strided = Sources.jdbcTable(spark, url, "books", props,
      partitionColumn = Some(("BOOK_ID", 1L, 101L, 4)))
    assert(strided.rdd.getNumPartitions == 4)
    assert(strided.select("BOOK_ID").as[Int].collect().toSet == whole)
  }

  test("S3/S4 shapes compose on a live JDBC source: agg+HAVING and latest-k") {
    val df = Sources.jdbcTable(spark, url, "books", props)
    // S3: group + HAVING group size
    val tags = df.groupBy("TAG").count().where(col("count") >= 15)
      .as[(String, Long)].collect().toMap
    assert(tags.keySet == Set("tag1", "tag2"))   // 100/7: tags 1,2 have 15
    // S4: top-1 by rating per tag through the window operator
    val top = graft.operators.TopK.topKPerKey(df, Seq("TAG"),
        order = Seq(col("RATING").desc, col("BOOK_ID").asc), k = 1)
      .select("TAG", "BOOK_ID").as[(String, Int)].collect().toMap
    assert(top.size == 7 && top.values.toSet.size == 7)
  }

  test("K5: insertIgnore appends only absent keys through a real write") {
    val existing = Sources.jdbcTable(spark, url, "books", props)
    val incoming = Seq(
      (42, "dup row — must not append", 9.9, "dup"),
      (101, "new row", 4.5, "new"),
      (102, "another new row", 3.5, "new")
    ).toDF("BOOK_ID", "TITLE", "RATING", "TAG")
    JdbcUpsert.insertIgnore(incoming, existing, Seq("BOOK_ID"))
      .write.mode("append").jdbc(url, "books", props)
    val after = Sources.jdbcTable(spark, url, "books", props)
    assert(after.count() == 102)
    assert(after.where(col("BOOK_ID") === 42)
      .select("TITLE").as[String].head() == "book 42")   // untouched
    assert(after.where(col("BOOK_ID") >= 101).count() == 2)
  }
}
