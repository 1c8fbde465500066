package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repetition quality signal: one
  * pass over the raw text computing token and 3-gram shingle counts
  * plus their distinct counts — the inputs of the Gopher-style rep1 /
  * rep3 ratios. Replaces the HOF pipeline (split → transform(slice →
  * array_join) → two array_distincts) that allocates ~2 Catalyst
  * string arrays per document and runs its lambdas interpreted; here
  * the shingle windows are dedup'd through one HashSet without ever
  * materializing shingle strings beyond the set keys. Exact string
  * semantics (same whitespace split, same distinct) — the DuckDB
  * oracle is unchanged.
  */
case class RepStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"

  override def nullSafeEval(a: Any): Any =
    TextExpressions.repStats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExpressions.repStats($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {

  /** Single-pass token/shingle census (called from codegen). */
  def repStats(text: UTF8String): GenericInternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val distinctToks = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinctToks.add(toks(i)); i += 1 }
    val nGrams = math.max(n - 2, 0)
    val distinctGrams = new java.util.HashSet[String]()
    i = 0
    while (i < nGrams) {
      // the same "w1 w2 w3" join the HOF form produced
      distinctGrams.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, distinctToks.size.toLong,
      nGrams.toLong, distinctGrams.size.toLong))
  }

  /** Codegen'd struct(n_tokens, n_distinct_tokens, n_grams,
    * n_distinct_grams) over a text column.
    */
  def repStatsCol(text: Column): Column =
    GraftSqlBridge.column(RepStatsExpr(GraftSqlBridge.expression(text)))
}
