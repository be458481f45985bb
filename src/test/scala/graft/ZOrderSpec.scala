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

  test("written z-sorted files carry tight min/max stats on BOTH columns") {
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def fileExtents(sorted: org.apache.spark.sql.DataFrame, dir: String) = {
      // range-partition on the sort key into 16 files: each file is one
      // row group, so per-file min/max IS what row-group skipping sees
      sorted.repartitionByRange(16, col("__s")).sortWithinPartitions("__s")
        .drop("__s").write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).groupBy(input_file_name())
        .agg((fmax("x") - fmin("x")).as("dx"), (fmax("y") - fmin("y")).as("dy"))
        .select("dx", "dy").as[(Long, Long)].collect()
    }
    val zDir = java.nio.file.Files.createTempDirectory("zo").toString
    val rmDir = java.nio.file.Files.createTempDirectory("rm").toString
    val zExt = fileExtents(grid.withColumn("__s", Sink.zorder(col("x"), col("y"))), zDir)
    val rmExt = fileExtents(grid.withColumn("__s", col("x") * 32 + col("y")), rmDir)
    // 1024 rows / 16 files = 64-point aligned z-tiles: 8x8 extents
    assert(zExt.forall { case (dx, dy) => dx <= 7 && dy <= 7 },
      s"z files must be tight in both dims: ${zExt.toSeq}")
    // row-major files span the full y domain — a y-predicate skips nothing
    assert(rmExt.forall { case (_, dy) => dy == 31 }, rmExt.toSeq)
  }

  test("end-to-end: a 2-D box predicate READS fewer rows from z-order than row-major") {
    // The layout tests above prove tight extents; this proves the payoff —
    // the parquet reader actually SKIPS row groups at scan time. 128x128
    // grid → 64 files of 256 rows (one row group each, stats = file
    // min/max). Z-order: 256 consecutive z-points = one aligned 16x16
    // tile, so the box x,y ∈ [16,31]^2 lives in exactly ONE file.
    // Row-major: each file spans 2 x-values and the FULL y domain, so the
    // same box overlaps 8 files and y-stats prune nothing. The scan
    // node's numOutputRows metric counts rows the reader emitted AFTER
    // row-group skipping — the end-to-end number the layout exists for.
    val grid = (for (x <- 0 until 128; y <- 0 until 128)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def rowsRead(dir: String, sortKey: org.apache.spark.sql.Column): Long = {
      grid.withColumn("__s", sortKey)
        .repartitionByRange(64, col("__s")).sortWithinPartitions("__s")
        .drop("__s").write.mode("overwrite").parquet(dir)
      val q = spark.read.parquet(dir)
        .where(col("x") >= 16 && col("x") <= 31 && col("y") >= 16 && col("y") <= 31)
      // metrics live on the executed plan INSTANCE — run that exact plan
      // (a separate count() would execute a different physical plan)
      val plan = q.queryExecution.executedPlan
      assert(plan.executeCollect().length == 256) // correctness before metrics
      plan.collectLeaves().head.metrics("numOutputRows").value
    }
    val zRows = rowsRead(
      java.nio.file.Files.createTempDirectory("zskip").toString,
      Sink.zorder(col("x"), col("y")))
    val rmRows = rowsRead(
      java.nio.file.Files.createTempDirectory("rmskip").toString,
      col("x") * 128 + col("y"))
    assert(zRows < rmRows,
      s"z-order must read fewer rows ($zRows) than row-major ($rmRows)")
    assert(zRows <= 512, s"z-order should read ~1 row group, got $zRows rows")
    assert(rmRows >= 1024, s"row-major should read >= 8 x-slab files, got $rmRows")
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
