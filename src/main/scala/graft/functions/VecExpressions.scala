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

  /** All-pairs cosine verification INSIDE one LSH bucket, fused: input
    * is the bucket's collect_list of (id, vector) structs, output is
    * only the pairs whose cosine clears `threshold`, as (a, b, cosine)
    * structs with a < b by id. The O(k²·d) loop runs over primitive
    * arrays extracted once per bucket — no per-pair struct-of-two-
    * vectors ever materializes (the explode(pairsOf(...)) shape it
    * replaces built k²/2 rows × 2 vectors per bucket before the first
    * cosine was even computed: ~37 GB of intermediate at 10× the
    * synthetic corpus). Members are sorted by id here, so pair
    * orientation and the sequential-sum argument order match the
    * sort_array-then-pairsOf composition bit for bit.
    */
  def nearDupPairs(members: ArrayData, threshold: Double): ArrayData = {
    val k = members.numElements()
    val ids = new Array[Long](k)
    val vecs = new Array[Array[Double]](k)
    var i = 0
    while (i < k) {
      val m = members.getStruct(i, 2)
      ids(i) = m.getLong(0)
      vecs(i) = m.getArray(1).toDoubleArray()
      i += 1
    }
    // sort members by id (collect_list order is nondeterministic)
    val order = Array.range(0, k).sortBy(ids(_))
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow]()
    i = 0
    while (i < k) {
      val a = order(i)
      var j = i + 1
      while (j < k) {
        val b = order(j)
        val c = cosineArr(vecs(a), vecs(b))
        if (c >= threshold) {
          out += org.apache.spark.sql.catalyst.InternalRow(ids(a), ids(b), c)
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  private def cosineArr(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      dot += x(i) * y(i)
      na += x(i) * x(i)
      nb += y(i) * y(i)
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

/** ARRAY<STRUCT<id BIGINT, v ARRAY<DOUBLE>>> bucket members →
  * ARRAY<STRUCT<a BIGINT, b BIGINT, cosine DOUBLE>> verified near-dup
  * pairs (a < b, cosine ≥ threshold). One fused kernel call per bucket.
  */
case class BucketNearDupPairs(child: Expression, threshold: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucketNearDupPairs expects ARRAY<STRUCT<BIGINT, ARRAY<DOUBLE>>>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    VecHashes.nearDupPairs(input.asInstanceOf[ArrayData], threshold)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecHashes.nearDupPairs($c, $threshold)")
  override protected def withNewChildInternal(newChild: Expression): BucketNearDupPairs =
    copy(child = newChild)
}

object vec {
  def hyperplaneBuckets(v: Column, planes: Array[Array[Double]],
                        planesPerBand: Int): Column =
    ColumnBridge.column(
      HyperplaneBuckets(ColumnBridge.expression(v), planes, planesPerBand))
  def bucketNearDupPairs(members: Column, threshold: Double): Column =
    ColumnBridge.column(
      BucketNearDupPairs(ColumnBridge.expression(members), threshold))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
