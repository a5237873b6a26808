package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items sketch over a LONG column — the mergeable
  * heavy-hitter summary (Misra & Gries 1982; mergeability per Agarwal
  * et al., PODS'12), completing the approximate-aggregation family next
  * to `approx_percentile` (A15) and HLL++ (A16). At most `capacity`
  * counters per group, whatever the input cardinality:
  *
  *  - update: increment a tracked item; insert while one of the
  *    `capacity` slots is free; otherwise decrement EVERY counter by
  *    one and drop
  *    zeros (the classic step — an untracked arrival "pays" one unit of
  *    every tracked count);
  *  - merge: add the two counter sets, then restore the bound by
  *    subtracting the (capacity+1)-largest combined count from every
  *    counter and dropping non-positives;
  *  - eval: counters as `array<struct<item, count_lb>>`, ordered by
  *    (count_lb desc, item asc), `count_lb` being a LOWER bound on the
  *    item's true count.
  *
  * Guarantee (any arrival order, any partitioning/merge tree): every
  * counter undercounts by at most the total decrement mass, which is at
  * most `n / (capacity + 1)` over `n` updates — so any item with true
  * count above `n / (capacity + 1)` is ALWAYS present. Which low-mass
  * items occupy leftover slots (and the exact `count_lb` values) IS
  * order-dependent — the sketch is a candidate FINDER with a guarantee,
  * not a deterministic result; deterministic pipelines re-count the
  * candidates exactly (see `Core.heavyHitters`'s refine pass).
  *
  * Scale shape: a `groupBy(g).agg(freq_items(x, c))` shuffles at most
  * `c` counters per group per map task instead of the full (g, x) key
  * space — the point of the sketch at 100 TB, where distinct users per
  * metric can dwarf executor memory.
  */
case class FreqItemsSketch(child: Expression, capacity: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("count_lb", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_items expects an integral input, got ${other.sql}")
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty

  override def update(b: mutable.LongMap[Long],
                      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Number].longValue()
      if (b.contains(item)) b(item) += 1L
      else if (b.size < capacity) b(item) = 1L
      else {
        // decrement-all: collect first (no mutation mid-iteration)
        val dead = mutable.ArrayBuffer.empty[Long]
        b.foreachEntry { (k, c) =>
          if (c <= 1L) dead += k else b(k) = c - 1L
        }
        dead.foreach(b.remove)
      }
    }
    b
  }

  override def merge(b: mutable.LongMap[Long],
                     other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (k, c) =>
      b(k) = b.getOrElse(k, 0L) + c
    }
    if (b.size > capacity) {
      // subtract the (capacity+1)-largest count from everything; at most
      // `capacity` strictly-larger counters survive
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[Long]
      b.foreachEntry { (k, c) =>
        if (c <= cut) dead += k else b(k) = c - cut
      }
      dead.foreach(b.remove)
    }
    b
  }

  override def eval(b: mutable.LongMap[Long]): Any = {
    val entries = b.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(entries.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    })
  }

  override def serialize(b: mutable.LongMap[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + 16 * b.size)
    buf.putInt(b.size)
    b.foreachEntry { (k, c) => buf.putLong(k); buf.putLong(c) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { b(buf.getLong) = buf.getLong; i += 1 }
    b
  }

  override def prettyName: String = "freq_items"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsSketch =
    copy(child = newChild)
}

object FreqItemsSketch {
  /** Column API: Misra–Gries counters for `e` (BIGINT), at most
    * `capacity` of them — see class doc for the undercount bound.
    */
  def apply(e: Column, capacity: Int): Column =
    ColumnBridge.column(
      new FreqItemsSketch(ColumnBridge.expression(e), capacity)
        .toAggregateExpression())
}
