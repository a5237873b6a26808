package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Z-order (Morton) curve kernels for multi-dimensional data layout.
  *
  * Sorting a composite key by the interleaved bits of two coordinates
  * clusters rows that are close in BOTH dimensions into the same key
  * ranges — so a bulk-load sorted on `zorder(user, hour)` serves
  * user-range × time-range scans from a bounded number of key ranges
  * (row-group / region prunable), where a plain `(user, hour)`
  * concatenation only prunes on the leading column. Same layout trick
  * as Delta/Iceberg Z-ordering and HBase key design guides, computed
  * with the classic O(1) magic-number bit spreading.
  */
object ZOrderKernel {

  /** Spreads the low 32 bits of `x` to the even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Packs the even bit positions of `z` back into a 32-bit value. */
  def compact(z0: Long): Long = {
    var z = z0 & 0x5555555555555555L
    z = (z | (z >>> 1)) & 0x3333333333333333L
    z = (z | (z >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    z = (z | (z >>> 4)) & 0x00ff00ff00ff00ffL
    z = (z | (z >>> 8)) & 0x0000ffff0000ffffL
    z = (z | (z >>> 16)) & 0x00000000ffffffffL
    z
  }

  /** 64-bit Morton code: bits of `a` at odd positions, `b` at even —
    * only the low 32 bits of each input participate.
    */
  def interleave(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)

  /** First coordinate back out of [[interleave]]. */
  def aOf(z: Long): Long = compact(z >>> 1)

  /** Second coordinate back out of [[interleave]]. */
  def bOf(z: Long): Long = compact(z)
}

/** `zorder(a, b)` as a whole-stage-codegen Catalyst expression over two
  * BIGINT columns.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder expects (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernel.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderKernel.interleave($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

/** Coordinate extraction (`which` = 0 → first input, 1 → second). */
case class ZOrderCoord(child: Expression, which: Int) extends UnaryExpression {
  require(which == 0 || which == 1, "which must be 0 or 1")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorderCoord expects BIGINT, got ${child.dataType}")
  override protected def nullSafeEval(z: Any): Any =
    if (which == 0) ZOrderKernel.aOf(z.asInstanceOf[Long])
    else ZOrderKernel.bOf(z.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (which == 0) "aOf" else "bOf"
    defineCodeGen(ctx, ev, z => s"graft.functions.ZOrderKernel.$fn($z)")
  }
  override protected def withNewChildInternal(newChild: Expression): ZOrderCoord =
    copy(child = newChild)
}

/** Column-API entry points. */
object zo {
  def zorder(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder64(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long"))))
  def zorderA(z: Column): Column =
    ColumnBridge.column(ZOrderCoord(ColumnBridge.expression(z.cast("long")), 0))
  def zorderB(z: Column): Column =
    ColumnBridge.column(ZOrderCoord(ColumnBridge.expression(z.cast("long")), 1))
}
