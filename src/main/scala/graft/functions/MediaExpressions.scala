package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual-hash kernels for media payloads (SURVEY F5). */
object MediaHashes {

  /** Average-hash (aHash) 64-bit perceptual fingerprint over raw
    * payload BYTES: 64 cells (equal byte windows), each thresholded
    * against the global mean, exact integer cross-multiplied
    * comparisons (`sums(j)·len > total·cnts(j)`, no float). This is
    * the format-agnostic pass — it needs no codec, so it applies to
    * ANY opaque payload (video included) and catches
    * mostly-same-bytes near-dups; its pixel-level sibling
    * [[MediaCodec.imageAHash64]] decodes real images first and
    * additionally catches re-encoded copies (different bytes, same
    * pixels). Payloads must be < 128 MiB (the exact integer
    * comparison needs 255·len² < 2⁶³); empty payloads hash to 0.
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

/** Closed-form REAL PNG payload of a doc id ([[MediaCodec.pngPayload]]
  * — real container bytes, pixels a pure integer function of the id,
  * so the decode oracle can replay the decoded statistics without a
  * codec). Codegen'd: the kernel call is static and never null. */
case class PngPayload(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT, got $other")
  }
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.pngPayload(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaCodec.pngPayload($c)")
  override protected def withNewChildInternal(newChild: Expression): PngPayload =
    copy(child = newChild)
}

/** Closed-form REAL WAV payload of a doc id ([[MediaCodec.wavPayload]]). */
case class WavPayload(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT, got $other")
  }
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.wavPayload(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaCodec.wavPayload($c)")
  override protected def withNewChildInternal(newChild: Expression): WavPayload =
    copy(child = newChild)
}

/** aHash of an image payload's REAL DECODED PIXELS
  * ([[MediaCodec.imageAHash64]]): null when the bytes do not decode —
  * a corrupt payload filters out instead of killing the job. Hand-
  * written null-aware codegen (defineCodeGen cannot express a
  * null-producing kernel); the codec call dominates the row's cost
  * either way. */
case class ImageAHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.imageAHash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}Box = graft.functions.MediaCodec.imageAHash64($c);
      if (${ev.value}Box == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Box.longValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression): ImageAHash64 =
    copy(child = newChild)
}

/** Column-API entry points for the media kernels. */
object media {
  def avgHash64(payload: Column): Column =
    ColumnBridge.column(AvgHash64(ColumnBridge.expression(payload)))
  def pngPayload(docId: Column): Column =
    ColumnBridge.column(PngPayload(ColumnBridge.expression(docId)))
  def wavPayload(docId: Column): Column =
    ColumnBridge.column(WavPayload(ColumnBridge.expression(docId)))
  def imageAHash64(payload: Column): Column =
    ColumnBridge.column(ImageAHash64(ColumnBridge.expression(payload)))
}
