package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard cap on the aggregation buffer: once a
  * group has accumulated `cap + 1` elements, further updates and merge
  * input are discarded, so no group can ever build a buffer larger
  * than `cap + 1` elements — regardless of how hot the key is.
  *
  * The cap is a *detector*, not a sampler: callers that drop over-cap
  * groups (`size(xs) <= cap`) get exactly the same result as an
  * uncapped collect + size filter, because any group whose true size
  * exceeds `cap` is guaranteed to surface with buffer size `cap + 1`
  * (updates stop appending only past that point, and merge keeps
  * appending partial buffers until it crosses it). Groups at or under
  * the cap are collected in full. Callers that instead *keep* a capped
  * prefix must treat it as an arbitrary (shuffle-order) sample, same
  * nondeterminism contract as collect_list itself.
  *
  * Used by [[graft.operators.Dedup.embeddingNearDup]] so a degenerate
  * LSH bucket (millions of near-identical vectors on one band key at
  * real corpus scale) costs O(cap · dim) buffer memory instead of
  * materializing the whole bucket's vectors before the size filter
  * throws them away.
  */
case class CappedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  private val limit = cap + 1

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.size >= limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.size < limit && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  override def prettyName: String = "capped_collect_list"

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectList =
    copy(child = newChild)
}

object CappedCollectList {
  /** Column API: `cappedCollectList(e, cap)` — see class doc for the
    * over-cap detection contract.
    */
  def apply(e: Column, cap: Int): Column =
    ColumnBridge.column(
      new CappedCollectList(ColumnBridge.expression(e), cap).toAggregateExpression())
}
