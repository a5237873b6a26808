package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Static vector kernels + expressions for the ANN/near-dup operators. */
object VecHashes {

  /** Cosine similarity, one fused pass; all three accumulators are
    * plain sequential sums (reproducible, oracle-parity).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** All random-hyperplane band keys of a vector in one pass:
    * out(b) = packed sign bits of planes [b·planesPerBand, (b+1)·ppb).
    */
  def hyperplaneBuckets(vec: ArrayData, planes: Array[Array[Double]],
                        planesPerBand: Int): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Long](planes.length / planesPerBand)
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var s = 0.0
      var i = 0
      val d = math.min(dim, pl.length)
      while (i < d) { s += vec.getDouble(i) * pl(i); i += 1 }
      if (s > 0) out(p / planesPerBand) |= (1L << (p % planesPerBand))
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Binary-expression input check shared by the vector ops. */
private[graft] trait DoubleArrayPair extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<DOUBLE>, got $other")
    }
}

/** Fused cosine similarity of two ARRAY<DOUBLE> columns: one pass, no
  * intermediate arrays (the zip_with/aggregate composition allocates a
  * products array per row). Accumulation is sequential left-to-right,
  * matching a plain fold — and the DuckDB oracle's list_sum — bit for
  * bit.
  */
case class CosineSim(left: Expression, right: Expression) extends DoubleArrayPair {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecHashes.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecHashes.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

/** ARRAY<DOUBLE> → per-band hyperplane sign-bucket keys (ARRAY<BIGINT>,
  * one element per band). The plane matrix rides along as a codegen
  * reference object — one fused kernel call per row instead of
  * bands×planes nested higher-order-function aggregates.
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Double]],
                             planesPerBand: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplaneBuckets expects ARRAY<DOUBLE>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    VecHashes.hyperplaneBuckets(input.asInstanceOf[ArrayData], planes,
      planesPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecHashes.hyperplaneBuckets($c, $ref, $planesPerBand)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object vec {
  def hyperplaneBuckets(v: Column, planes: Array[Array[Double]],
                        planesPerBand: Int): Column =
    ColumnBridge.column(
      HyperplaneBuckets(ColumnBridge.expression(v), planes, planesPerBand))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
