package graft.plans

import graft.functions.Wkt
import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Exact point-in-polygon as a first-class Catalyst expression. The
  * polygon WKT is almost always a literal, so the ring is parsed once
  * at expression construction, not per row. Evaluation is interpreted
  * (CodegenFallback) — it only ever runs on rows that survived the
  * bbox prefilter injected by [[PolygonBBoxPushdown]].
  */
case class PolygonContains(wkt: Expression, x: Expression, y: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = wkt
  override def second: Expression = x
  override def third: Expression = y
  override def dataType: DataType = BooleanType
  override def prettyName: String = "polygon_contains"

  @transient lazy val ring: Array[(Double, Double)] =
    Wkt.parsePolygon(wkt.eval(null).toString)

  override def nullSafeEval(w: Any, xv: Any, yv: Any): Any =
    Wkt.contains(ring, xv.asInstanceOf[Double], yv.asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(wkt = newFirst, x = newSecond, y = newThird)
}

/** The reference's own pruning trick (SolrProxy.pyx:193 encodes the
  * polygon's bbox as a range query): every `polygon_contains(lit, x, y)`
  * conjunct in a Filter gets its bbox range conjunction added, which
  * Catalyst then pushes to the parquet scan — so the interpreted exact
  * test only sees rows inside the bounding box. Idempotent: skips
  * conjuncts whose bbox ranges are already present.
  */
object PolygonBBoxPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val cs = conjuncts(cond)
      val extra = cs.collect {
        case pc @ PolygonContains(Literal(_, _), x, y) =>
          val (minX, maxX, minY, maxY) = Wkt.bbox(pc.ring)
          Seq(
            GreaterThanOrEqual(x, Literal(minX)), LessThanOrEqual(x, Literal(maxX)),
            GreaterThanOrEqual(y, Literal(minY)), LessThanOrEqual(y, Literal(maxY)))
            .filterNot(r => cs.exists(_.semanticEquals(r)))
      }.flatten
      if (extra.isEmpty) f
      else Filter(extra.foldLeft(cond)(And(_, _)), child)
  }
}

/** Session wiring: `spark.sql.extensions=graft.plans.GraftExtensions`
  * or `GraftExtensions.enable(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => PolygonBBoxPushdown)
}

object GraftExtensions {
  /** Attach the rule to an already-running session. */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(PolygonBBoxPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PolygonBBoxPushdown

  /** Column-level constructor for the native expression. */
  def polygonContains(wkt: String, x: Column, y: Column): Column =
    GraftSqlBridge.column(PolygonContains(
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(wkt)),
      GraftSqlBridge.expression(x.cast("double")),
      GraftSqlBridge.expression(y.cast("double"))))
}
