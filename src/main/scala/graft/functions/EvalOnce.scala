package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports `deterministic = false` so the
  * optimizer will not SUBSTITUTE the wrapped expression tree across a
  * Project boundary.
  *
  * Why this exists (guide §4.4 applied to native expressions): when a
  * filter references a column computed by a projection —
  * `withColumn("quality", kernel(text)).filter($"quality" >= 0.7)` —
  * `PushDownPredicates` rewrites the filter condition by inlining the
  * alias, producing a plan that evaluates `kernel(text)` in BOTH the
  * pushed-down Filter and the Project above it (Filter and Project are
  * separate codegen operators, so whole-stage codegen's subexpression
  * elimination never merges them). For an expensive per-row kernel that
  * doubles the scan stage's dominant cost. The rule only fires on
  * deterministic projections, so a wrapper whose ONLY effect is
  * `deterministic = false` pins the kernel to its declared projection:
  * one evaluation per row, the filter runs above on the plain
  * attribute. Evaluation (interpreted and codegen) is a pure
  * pass-through of the child — values, nullability and type are the
  * child's, so results are unchanged by construction.
  *
  * Trade-off (same as the guide's `asNondeterministic` advice): the
  * barrier also stops OTHER rewrites through the projection (e.g.
  * collapsing it into a neighbor), so apply it to expensive kernels
  * that a downstream filter consumes, not blanket.
  */
case class EvalOnceExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "eval_once"
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: Expression): EvalOnceExpr = copy(child = newChild)
}

object EvalOnce {
  /** Wrap a column so its expression tree is evaluated exactly where it
    * is declared (see [[EvalOnceExpr]]).
    */
  def apply(c: Column): Column =
    ColumnBridge.column(EvalOnceExpr(ColumnBridge.expression(c)))
}
