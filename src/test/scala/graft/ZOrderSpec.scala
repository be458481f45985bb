package graft

import org.apache.spark.sql.functions._
import graft.io.Sink

/** Z-order layout: the Morton code must interleave exactly (checked
  * bit-by-bit against a reference implementation), and z-sorted blocks must
  * actually deliver the locality the layout exists for — bounded extents in
  * BOTH dimensions, where a row-major sort degrades one of them to the full
  * domain width. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 31) {
      out |= ((a >> i) & 1L) << (2 * i)
      out |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  test("morton code matches the bit-by-bit reference on random ranks") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val a = rnd.nextLong().abs & 0x7FFFFFFFL
      val b = rnd.nextLong().abs & 0x7FFFFFFFL
      assert(graft.expressions.ZOrder2.morton(a, b) == mortonRef(a, b))
    }
    // boundary values
    for (a <- Seq(0L, 1L, 0x7FFFFFFFL); b <- Seq(0L, 1L, 0x7FFFFFFFL))
      assert(graft.expressions.ZOrder2.morton(a, b) == mortonRef(a, b))
  }

  test("expression and SQL forms agree with the local kernel") {
    GraftExtensions.register(spark)
    val df = Seq((3L, 5L), (100L, 7L), (0L, 0L)).toDF("a", "b")
    val viaCol = df.select(Sink.zorder(col("a"), col("b"))).as[Long].collect()
    val viaSql = df.createOrReplaceTempView("zspec_t")
    val sql = spark.sql("SELECT zorder2(a, b) FROM zspec_t").as[Long].collect()
    val exp = Seq((3L, 5L), (100L, 7L), (0L, 0L)).map((mortonRef _).tupled)
    assert(viaCol.toSeq == exp && sql.toSeq == exp)
  }

  test("z-sorted blocks have bounded extents in BOTH dims; row-major does not") {
    // 32x32 grid, blocks of 64 consecutive rows under each ordering
    val grid = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    def blockExtents(sorted: Seq[(Long, Long)]): Seq[(Long, Long)] =
      sorted.grouped(64).map { blk =>
        val xs = blk.map(_._1); val ys = blk.map(_._2)
        (xs.max - xs.min, ys.max - ys.min)
      }.toSeq
    val zSorted = grid.sortBy { case (x, y) => graft.expressions.ZOrder2.morton(x, y) }
    val rowMajor = grid.sortBy { case (x, y) => x * 32 + y }
    val zExt = blockExtents(zSorted)
    val rmExt = blockExtents(rowMajor)
    // 64 points in z-order = one aligned 8x8 tile: extent 7 in both dims
    assert(zExt.forall { case (dx, dy) => dx <= 7 && dy <= 7 }, zExt.take(4))
    // row-major blocks span the full 32-wide y domain
    assert(rmExt.forall { case (_, dy) => dy == 31 })
  }
}
