package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Single-evaluation barrier for an EXPENSIVE derived column (r15,
  * guide §4.4 applied to a built-in): when a filter references a
  * column computed by a deterministic projection, PushDownPredicates
  * substitutes the defining expression into the pushed filter — the
  * expression then evaluates once per input row in the filter AND
  * once per surviving row in the projection, and the pushed filter
  * can keep sinking below a `spread` repartition, serializing the
  * whole computation onto the scan's single task (the s7 gate: three
  * `get_json_object` parses per row, two of them single-threaded
  * below the exchange).
  *
  * Wrapping the defining expression in [[EvalOnceExpr]] marks it
  * non-deterministic for the OPTIMIZER ONLY — the wrapped child is a
  * pure function and the value is unchanged; codegen and interpreted
  * eval are byte-identical passthroughs — so predicate pushdown and
  * expression duplication stop at the projection: one evaluation per
  * row, in the stage where the projection was written (after the
  * spread, on every core). The guide's trade-off applies: OTHER
  * filters also stop pushing past the marked projection, so wrap
  * only expressions whose duplicated/serialized evaluation is the
  * dominant cost, never blanket.
  */
case class EvalOnceExpr(child: Expression) extends UnaryExpression {
  // optimizer-only pessimism; the child must itself be deterministic
  // (a genuinely nondeterministic child would need Stateful handling)
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalOnceExpr =
    copy(child = newChild)
  override def prettyName: String = "eval_once"
}

object EvalOnce {
  def once(c: Column): Column =
    GraftSqlBridge.column(EvalOnceExpr(GraftSqlBridge.expression(c)))
}
