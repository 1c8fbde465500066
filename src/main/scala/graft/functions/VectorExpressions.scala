package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the similarity hot path: a
  * whole-stage-codegen dot product over two ARRAY<DOUBLE> columns.
  * Replaces the interpreted `aggregate(zip_with(...))` fold — same
  * left-to-right summation order (so DuckDB-oracle equality is
  * unaffected), but compiled to a tight primitive loop with no
  * per-element lambda dispatch or intermediate array.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be ARRAY<DOUBLE>; callers cast (vecDot does)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName locals: with non-nullable children the emitted code
      // is not block-scoped, and fixed names would collide with a
      // second instance or the enclosing codegen method (the silent-
      // fallback class RollingHashExpr hit — see SCALING.md r8)
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for symmetric int8 quantization stats:
  * one compiled pass over an ARRAY<DOUBLE> column producing
  * struct(scale, qsum, max_err, rmse). Replaces four interpreted HOF
  * lambda folds (amax + codes-sum + err-max + err-sumsq) with a single
  * primitive loop — same accumulation order (left-to-right), so the
  * DuckDB-oracle equality is unaffected, but ~d× fewer lambda
  * dispatches per row on the 100 TB hot path.
  */
case class QuantizeStatsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("qsum", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("max_err", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("rmse", DoubleType, nullable = false)))
  override def prettyName: String = "quantize_stats"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) { val x = math.abs(v.getDouble(i)); if (x > amax) amax = x; i += 1 }
    val scale = math.max(amax, 1e-30) / 127.0
    var qsum = 0.0
    var maxe = 0.0
    var sse = 0.0
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val q = math.floor(x / scale + 0.5)
      qsum += q
      val e = math.abs(x - q * scale)
      if (e > maxe) maxe = e
      sse += e * e
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, qsum.toLong, maxe, math.sqrt(sse / n)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName locals — same unscoped-collision hazard as vec_dot
      val n = ctx.freshName("n"); val amax = ctx.freshName("amax")
      val scale = ctx.freshName("scale"); val qsum = ctx.freshName("qsum")
      val maxe = ctx.freshName("maxe"); val sse = ctx.freshName("sse")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val q = ctx.freshName("q"); val e = ctx.freshName("e")
      s"""
         |int $n = $a.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs($a.getDouble($i));
         |  if ($x > $amax) $amax = $x;
         |}
         |double $scale = java.lang.Math.max($amax, 1e-30) / 127.0;
         |double $qsum = 0.0; double $maxe = 0.0; double $sse = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $q = java.lang.Math.floor($x / $scale + 0.5);
         |  $qsum += $q;
         |  double $e = java.lang.Math.abs($x - $q * $scale);
         |  if ($e > $maxe) $maxe = $e;
         |  $sse += $e * $e;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$scale, (long) $qsum, $maxe, java.lang.Math.sqrt($sse / $n)});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Codegen'd Σ aᵢ·bᵢ over ARRAY<DOUBLE> columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Codegen'd int8 quantization stats over an ARRAY<DOUBLE> column:
    * struct(scale, qsum, max_err, rmse).
    */
  def quantizeStats(v: Column): Column =
    GraftSqlBridge.column(QuantizeStatsExpr(
      GraftSqlBridge.expression(v.cast("array<double>"))))
}
