package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for dedup/fingerprint hashing — codegen'd
  * calls into [[TextHashes]] static kernels, so MinHash/SimHash stay
  * inside whole-stage codegen (no Scala UDF boxing in the hot path).
  */
private[graft] trait ArrayOfLongInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got $other")
  }
}

/** `perms`-permutation MinHash signature of an ARRAY<BIGINT> hash set. */
case class MinHashSig(child: Expression, perms: Int) extends ArrayOfLongInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.minhashSig(input.asInstanceOf[ArrayData], perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.minhashSig($c, $perms)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash (per-bit majority vote) of an ARRAY<BIGINT> hash set. */
case class SimHash64(child: Expression) extends ArrayOfLongInput {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

private[graft] trait StringInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got $other")
  }
}

/** Whole-content 64-bit polynomial (Rabin–Karp) fingerprint. */
case class RollingFp(child: Expression) extends StringInput {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.rollingFp(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.rollingFp($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
}

/** Min mixed hash over all `window`-byte rolling windows (winnowing). */
case class RollingWindowMin(child: Expression, window: Int) extends StringInput {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.rollingWindowMin(input.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.rollingWindowMin($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): RollingWindowMin =
    copy(child = newChild)
}

/** All mixed hashes of the `window`-byte rolling windows, in order. */
case class RollingWindows(child: Expression, window: Int)
    extends StringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.rollingWindows(input.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.rollingWindows($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): RollingWindows =
    copy(child = newChild)
}

/** Hashed-vocabulary linear score of an ARRAY<BIGINT> distinct token
  * hash set: Σ (weights[h & mask] − 2¹⁹). The trained weight table is
  * embedded in generated code as a reference object (buckets·8 bytes,
  * e.g. 32 KB at 4096 buckets), so scoring runs inside whole-stage
  * codegen with zero per-row allocation — the fastText-filter posture:
  * train once, score at scan speed.
  */
case class HashedLinearScore(child: Expression, weights: Array[Long])
    extends ArrayOfLongInput {
  require(weights.nonEmpty && (weights.length & (weights.length - 1)) == 0,
    "weights length must be a power of two")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.hashedLinearScore(input.asInstanceOf[ArrayData], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("hlWeights", weights, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.hashedLinearScore($c, $w)")
  }
  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

/** Cut the `window`-byte spans starting at the ascending ARRAY<INT>
  * positions (right child) out of the STRING (left child), merging
  * overlaps — one codegen pass over the doc bytes.
  */
case class CutWindows(left: Expression, right: Expression, window: Int)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (STRING, ARRAY<INT>), got $other")
    }
  override protected def nullSafeEval(text: Any, pos: Any): Any =
    TextHashes.cutWindows(text.asInstanceOf[UTF8String],
      pos.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.TextHashes.cutWindows($t, $p, $window)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutWindows =
    copy(left = newLeft, right = newRight)
}

/** One-pass distinct k-word-shingle hash set of a STRING column. */
case class WordShingleHashes(child: Expression, k: Int) extends StringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.wordShingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.wordShingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** Positional (duplicates-retained) word-shingle hash sequence. */
case class WordShingleSeq(child: Expression, k: Int) extends StringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.wordShingleSeq(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.wordShingleSeq($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleSeq =
    copy(child = newChild)
}

/** Codepoint count of `[^a-zA-Z0-9\s]` matches (punctuation metric). */
case class PunctCount(child: Expression) extends StringInput {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.punctCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.punctCount($c)")
  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

/** Fused [n_alnum, n_distinct, ent_scaled] char-entropy kernel (E11). */
case class CharEntropyStats(child: Expression) extends StringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.charEntropyStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.charEntropyStats($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

/** Fused [n_tokens, n_bpe_tokens, n_punct, n_digits, n_spaces]
  * char-class kernel (E1).
  */
case class CharClassStats(child: Expression) extends StringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashes.charClassStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.charClassStats($c)")
  override protected def withNewChildInternal(newChild: Expression): CharClassStats =
    copy(child = newChild)
}

/** Column-API entry points. */
object txt {
  def punctCount(s: Column): Column =
    ColumnBridge.column(PunctCount(ColumnBridge.expression(s)))
  def charClassStats(s: Column): Column =
    ColumnBridge.column(CharClassStats(ColumnBridge.expression(s)))
  def charEntropyStats(s: Column): Column =
    ColumnBridge.column(CharEntropyStats(ColumnBridge.expression(s)))
  def wordShingleHashes(s: Column, k: Int): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expression(s), k))
  def wordShingleSeq(s: Column, k: Int): Column =
    ColumnBridge.column(WordShingleSeq(ColumnBridge.expression(s), k))
  def minhash(hashes: Column, perms: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), perms))
  def simhash(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
  def rollingFp(s: Column): Column =
    ColumnBridge.column(RollingFp(ColumnBridge.expression(s)))
  def rollingWindows(s: Column, window: Int): Column =
    ColumnBridge.column(RollingWindows(ColumnBridge.expression(s), window))
  def rollingWindowMin(s: Column, window: Int): Column =
    ColumnBridge.column(RollingWindowMin(ColumnBridge.expression(s), window))
  def hashedLinearScore(hashes: Column, weights: Array[Long]): Column =
    ColumnBridge.column(HashedLinearScore(ColumnBridge.expression(hashes),
      weights))
  def cutWindows(s: Column, pos: Column, window: Int): Column =
    ColumnBridge.column(CutWindows(ColumnBridge.expression(s),
      ColumnBridge.expression(pos), window))
}
