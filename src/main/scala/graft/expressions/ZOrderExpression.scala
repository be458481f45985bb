package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Morton (z-order) interleave: bit i of `a` lands at output bit 2i,
  * bit i of `b` at 2i+1. Sorting rows by this value makes CONSECUTIVE rows
  * close in BOTH dimensions at once, so a file/row-group sorted by z-value
  * carries tight min/max stats on both columns — parquet row-group skipping
  * then prunes on either predicate, where a single-column sort only ever
  * prunes on its leading column. The layout companion to
  * [[graft.io.Sink.writePartitioned]]: compute the z-value, sort by it.
  *
  * Contract: inputs are non-negative BUCKET RANKS (ntile ranks, day
  * numbers, id buckets) in [0, 2^31); only the low 31 bits participate
  * (documented masking — map raw domains to ranks first, exactly as every
  * z-order implementation requires monotone dimension codes). Codegen'd —
  * this runs once per row in write paths.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ZOrder2.morton($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrder2 {
  /** Spread the low 31 bits of `x` to even bit positions (magic-mask
    * interleave, O(log w) shifts). */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
