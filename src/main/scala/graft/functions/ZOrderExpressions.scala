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

  /** Covering Morton intervals for the coordinate box [a0,a1]×[b0,b1]
    * (inclusive bounds, both coordinates in [0, 2³¹)): the read-side
    * half of a Z-order layout. BFS quadtree refinement — split
    * partially-overlapping cells breadth-first until the range budget
    * is reached, emit each cell's contiguous z-interval `[start, end)`,
    * then sort and merge adjacent intervals. The same fixed-depth quad
    * decomposition BIGMIN-style readers use: a budget-capped cover may
    * OVER-cover (callers re-apply the exact box predicate after the
    * scan — the standard residual rule; a full-depth cover is exact),
    * but it can never under-cover, and intervals come back sorted and
    * disjoint — ready to push as rowkey ranges so file/region pruning
    * reads only the curve segments that can intersect the box.
    */
  def queryRanges(a0: Long, a1: Long, b0: Long, b1: Long,
                  maxRanges: Int = 32): Seq[(Long, Long)] = {
    require(a0 <= a1 && b0 <= b1, s"empty box ($a0..$a1)x($b0..$b1)")
    require(a0 >= 0 && b0 >= 0 && a1 < (1L << 31) && b1 < (1L << 31),
      "coordinates must be in [0, 2^31)")
    require(maxRanges >= 4, s"maxRanges must be >= 4, got $maxRanges")
    final case class Cell(ca: Long, cb: Long, size: Long, z0: Long)
    def fullyInside(c: Cell): Boolean =
      c.ca >= a0 && c.ca + c.size - 1 <= a1 &&
        c.cb >= b0 && c.cb + c.size - 1 <= b1
    def overlaps(c: Cell): Boolean =
      c.ca <= a1 && c.ca + c.size - 1 >= a0 &&
        c.cb <= b1 && c.cb + c.size - 1 >= b0
    var out = List.empty[(Long, Long)]
    // the box always sits inside the (a<2^31, b<2^31) quadrant, whose
    // z-interval tops out at 2^62 — no 64-bit overflow anywhere below
    val partials = scala.collection.mutable.Queue(Cell(0L, 0L, 1L << 31, 0L))
    while (partials.nonEmpty) {
      val c = partials.dequeue()
      if (fullyInside(c) || c.size == 1L ||
          out.size + partials.size + 4 > maxRanges)
        out ::= (c.z0, c.z0 + c.size * c.size)
      else {
        val h = c.size / 2
        val q = h * h
        // z-quadrant order inside a cell: (a_hi, b_hi) lexicographic,
        // a riding the odd (higher) bit positions
        Seq(Cell(c.ca, c.cb, h, c.z0), Cell(c.ca, c.cb + h, h, c.z0 + q),
            Cell(c.ca + h, c.cb, h, c.z0 + 2 * q),
            Cell(c.ca + h, c.cb + h, h, c.z0 + 3 * q))
          .filter(overlaps).foreach(partials.enqueue(_))
      }
    }
    out.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((ps, pe) :: tail, (s, e)) if s <= pe =>
        (ps, math.max(pe, e)) :: tail
      case (acc, r) => r :: acc
    }.reverse
  }
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
