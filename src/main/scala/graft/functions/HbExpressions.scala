package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the HBase byte codec — codegen'd (no
  * Scala UDF in the hot path), staying inside whole-stage codegen.
  *
  * Byte layout parity: HBaseSerde.java:280-352 (encode),
  * HBaseSerde.java:391-447 (decode).
  */
private[graft] object Codec {
  val C = "graft.functions.BytesCodec"

  /** (codegen fragment, interpreted fn) pair per supported input type. */
  def encoderFor(dt: DataType): (String => String, Any => Array[Byte]) = dt match {
    case LongType      => (c => s"$C.encodeLong($c)",    v => BytesCodec.encodeLong(v.asInstanceOf[Long]))
    case IntegerType   => (c => s"$C.encodeInt($c)",     v => BytesCodec.encodeInt(v.asInstanceOf[Int]))
    case ShortType     => (c => s"$C.encodeShort($c)",   v => BytesCodec.encodeShort(v.asInstanceOf[Short]))
    case ByteType      => (c => s"$C.encodeByte($c)",    v => BytesCodec.encodeByte(v.asInstanceOf[Byte]))
    case DoubleType    => (c => s"$C.encodeDouble($c)",  v => BytesCodec.encodeDouble(v.asInstanceOf[Double]))
    case FloatType     => (c => s"$C.encodeFloat($c)",   v => BytesCodec.encodeFloat(v.asInstanceOf[Float]))
    case BooleanType   => (c => s"$C.encodeBoolean($c)", v => BytesCodec.encodeBoolean(v.asInstanceOf[Boolean]))
    case StringType    => (c => s"$c.getBytes()",        v => v.asInstanceOf[UTF8String].getBytes)
    case BinaryType    => (c => c,                       v => v.asInstanceOf[Array[Byte]])
    case DateType      => (c => s"$C.encodeInt($c)",     v => BytesCodec.encodeInt(v.asInstanceOf[Int]))
    // Spark timestamps are epoch micros; HBaseSerde stores epoch millis
    // (HBaseSerde.java:347-352). Floor-divide micros -> millis.
    case TimestampType | TimestampNTZType =>
      (c => s"$C.encodeLong(java.lang.Math.floorDiv($c, 1000L))",
       v => BytesCodec.encodeLong(Math.floorDiv(v.asInstanceOf[Long], 1000L)))
    // Spark TIME is nanos-of-day; the reference's sql.Time case stores
    // 8-byte long millis (HBaseTypeUtils.java:72, case 11). Floor nanos
    // -> millis-of-day.
    case _: TimeType =>
      (c => s"$C.encodeLong(java.lang.Math.floorDiv($c, 1000000L))",
       v => BytesCodec.encodeLong(Math.floorDiv(v.asInstanceOf[Long], 1000000L)))
    case d: DecimalType =>
      (c => s"$C.encodeDecimal($c.toJavaBigDecimal())",
       v => BytesCodec.encodeDecimal(
         v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal))
    case other => throw new IllegalArgumentException(s"hbEncode: unsupported $other")
  }

  def decoderFor(dt: DataType): (String => String, Array[Byte] => Any) = dt match {
    case LongType      => (c => s"$C.decodeLong($c)",    b => BytesCodec.decodeLong(b))
    case IntegerType   => (c => s"$C.decodeInt($c)",     b => BytesCodec.decodeInt(b))
    case ShortType     => (c => s"$C.decodeShort($c)",   b => BytesCodec.decodeShort(b))
    case ByteType      => (c => s"$C.decodeByte($c)",    b => BytesCodec.decodeByte(b))
    case DoubleType    => (c => s"$C.decodeDouble($c)",  b => BytesCodec.decodeDouble(b))
    case FloatType     => (c => s"$C.decodeFloat($c)",   b => BytesCodec.decodeFloat(b))
    case BooleanType   => (c => s"$C.decodeBoolean($c)", b => BytesCodec.decodeBoolean(b))
    case StringType    => (c => s"UTF8String.fromBytes($c)", b => UTF8String.fromBytes(b))
    case BinaryType    => (c => c,                       b => b)
    case DateType      => (c => s"$C.decodeInt($c)",     b => BytesCodec.decodeInt(b))
    case TimestampType | TimestampNTZType =>
      (c => s"java.lang.Math.multiplyExact($C.decodeLong($c), 1000L)",
       b => Math.multiplyExact(BytesCodec.decodeLong(b), 1000L))
    case _: TimeType =>
      (c => s"java.lang.Math.multiplyExact($C.decodeLong($c), 1000000L)",
       b => Math.multiplyExact(BytesCodec.decodeLong(b), 1000000L))
    case d: DecimalType =>
      (c => s"org.apache.spark.sql.types.Decimal.apply($C.decodeDecimal($c), ${d.precision}, ${d.scale})",
       b => org.apache.spark.sql.types.Decimal(BytesCodec.decodeDecimal(b), d.precision, d.scale))
    case other => throw new IllegalArgumentException(s"hbDecode: unsupported $other")
  }
}

/** Encode a typed field into HBase big-endian bytes. */
case class HbEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  private lazy val (gen, fn) = Codec.encoderFor(child.dataType)
  override def checkInputDataTypes(): TypeCheckResult =
    try { Codec.encoderFor(child.dataType); TypeCheckResult.TypeCheckSuccess }
    catch { case e: IllegalArgumentException =>
      TypeCheckResult.TypeCheckFailure(e.getMessage) }
  override protected def nullSafeEval(input: Any): Any = fn(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, gen)
  override protected def withNewChildInternal(newChild: Expression): HbEncode =
    copy(child = newChild)
}

/** Decode HBase big-endian bytes back into a typed field. */
case class HbDecode(child: Expression, targetType: DataType)
    extends UnaryExpression {
  override def dataType: DataType = targetType
  private lazy val (gen, fn) = Codec.decoderFor(targetType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("hbDecode expects BINARY input")
  override protected def nullSafeEval(input: Any): Any =
    fn(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, gen)
  override protected def withNewChildInternal(newChild: Expression): HbDecode =
    copy(child = newChild)
}

/** java.util.Arrays.hashCode over a binary column (salt parity with
  * TsdbBulkload.java:94).
  */
case class ArraysHashCode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("arraysHashCode expects BINARY input")
  override protected def nullSafeEval(input: Any): Any =
    BytesCodec.javaArraysHashCode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BytesCodec.javaArraysHashCode($c)")
  override protected def withNewChildInternal(newChild: Expression): ArraysHashCode =
    copy(child = newChild)
}

/** Per-cell TTL in milliseconds from an HBase tag block (tag type 8,
  * the layout `PrivateCellUtil.getTTL` reads), or -1 when the cell
  * carries no TTL tag. Codegen'd static call, so TTL expiry runs inside
  * whole-stage codegen during compaction scans.
  */
case class HbTagTtl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("tagTtl expects BINARY input")
  override protected def nullSafeEval(input: Any): Any =
    BytesCodec.ttlTagMs(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BytesCodec.ttlTagMs($c)")
  override protected def withNewChildInternal(newChild: Expression): HbTagTtl =
    copy(child = newChild)
}

/** HBase FuzzyRowFilter over a BINARY rowkey column: true when the key
  * matches ANY (pattern, mask) pair — mask byte 0 pins the pattern byte,
  * nonzero is a wildcard (TsdbScanner.java:16-53 pins the 4 time bytes
  * at offset 3 and wildcards the 3 metric-id bytes). The pair list is a
  * plan-time constant, embedded in generated code as a reference object,
  * so the match runs inside whole-stage codegen with zero per-row
  * allocation.
  *
  * Scale note: like HBase's server-side filter this is a post-scan
  * predicate — it cannot prune parquet row groups by itself. Pair it
  * with a coarse pushed-down range predicate covering the patterns'
  * span (the analogue of Scan.setStartRow/setStopRow around a
  * FuzzyRowFilter).
  */
case class FuzzyRowMatch(child: Expression,
                         pairs: Seq[(Seq[Byte], Seq[Byte])])
    extends UnaryExpression {
  require(pairs.nonEmpty, "fuzzyRowMatch needs at least one (pattern, mask) pair")
  require(pairs.forall(p => p._1.length == p._2.length),
    "each fuzzy pattern and its mask must have equal length")
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("fuzzyRowMatch expects BINARY input")
  @transient private lazy val patterns: Array[Array[Byte]] =
    pairs.map(_._1.toArray).toArray
  @transient private lazy val masks: Array[Array[Byte]] =
    pairs.map(_._2.toArray).toArray
  override protected def nullSafeEval(input: Any): Any =
    BytesCodec.fuzzyMatch(input.asInstanceOf[Array[Byte]], patterns, masks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("fuzzyPatterns", patterns, "byte[][]")
    val m = ctx.addReferenceObj("fuzzyMasks", masks, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BytesCodec.fuzzyMatch($c, $p, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): FuzzyRowMatch =
    copy(child = newChild)
}

/** Column-API entry points for the codec expressions. */
object hb {
  def encode(c: Column): Column =
    ColumnBridge.column(HbEncode(ColumnBridge.expression(c)))
  def decode(c: Column, dt: DataType): Column =
    ColumnBridge.column(HbDecode(ColumnBridge.expression(c), dt))
  def arraysHashCode(c: Column): Column =
    ColumnBridge.column(ArraysHashCode(ColumnBridge.expression(c)))
  /** Cell TTL ms from an HBase tag block (type-8 tag), -1 when absent. */
  def tagTtl(c: Column): Column =
    ColumnBridge.column(HbTagTtl(ColumnBridge.expression(c)))
  /** FuzzyRowFilter match over (pattern, mask) byte pairs; mask 0 = must
    * match, nonzero = wildcard.
    */
  def fuzzyRowMatch(c: Column, pairs: Seq[(Array[Byte], Array[Byte])]): Column =
    ColumnBridge.column(FuzzyRowMatch(ColumnBridge.expression(c),
      pairs.map(p => (p._1.toSeq, p._2.toSeq))))
}
