package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual-hash kernels for media payloads (SURVEY F5). */
object MediaHashes {

  /** Average-hash (aHash) 64-bit perceptual fingerprint. The real
    * algorithm is intact — 64 cells, each thresholded against the
    * global mean, exact integer cross-multiplied comparisons
    * (`sums(j)·len > total·cnts(j)`, no float) — while the "decoded
    * 8×8 luminance grid" follows the F2 STUB RULE (the container has
    * no codecs): cell j is the mean of the j-th of 64 equal byte
    * windows of the raw payload, a pure function of the bytes. That
    * keeps aHash's defining behavior byte-level-local — payloads
    * sharing most bytes hash within a few bits, exactly how aHash
    * behaves on visually similar images — and swapping the windows
    * for real resized pixels changes nothing downstream. Payloads
    * must be < 128 MiB (the exact integer comparison needs
    * 255·len² < 2⁶³); empty payloads hash to 0.
    */
  def avgHash64(payload: Array[Byte]): Long = {
    val len = payload.length
    if (len == 0) return 0L
    require(len < (1 << 27), s"avgHash64 payload too large: $len bytes")
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < len) {
      val b = (payload(i) & 0xFF).toLong
      val j = (i.toLong * 64 / len).toInt
      sums(j) += b
      cnts(j) += 1
      total += b
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (cnts(j) > 0 && sums(j) * len > total * cnts(j)) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** 64-bit average-hash of a BINARY payload (codegen'd kernel call). */
case class AvgHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got $other")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    MediaHashes.avgHash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaHashes.avgHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): AvgHash64 =
    copy(child = newChild)
}

/** Column-API entry points for the media kernels. */
object media {
  def avgHash64(payload: Column): Column =
    ColumnBridge.column(AvgHash64(ColumnBridge.expression(payload)))
}
