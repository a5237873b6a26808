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
}
