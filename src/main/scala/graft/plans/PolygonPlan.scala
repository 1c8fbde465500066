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

  // the ring caches at plan time from wkt.eval(null) — sound ONLY for
  // foldable wkt; a per-row wkt column would silently evaluate against
  // one cached ring (and NPE at eval). checkInputDataTypes (not a
  // constructor require) is where analysis-time validation belongs:
  // the analyzer copies expressions through intermediate states where
  // a constructor assertion misfires
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!wkt.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "polygon_contains: the wkt argument must be a literal (the " +
          "ring parses once at plan time, not per row)")
    else super.checkInputDataTypes()

  override def first: Expression = wkt
  override def second: Expression = x
  override def third: Expression = y
  override def dataType: DataType = BooleanType
  override def prettyName: String = "polygon_contains"

  @transient lazy val ring: Array[(Double, Double)] = {
    val w = wkt.eval(null)
    require(w != null, "polygon_contains: wkt is NULL")
    Wkt.parsePolygon(w.toString)
  }

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
        // a NULL wkt literal stays out of the rewrite (its predicate is
        // null for every row — the filter already drops everything;
        // touching pc.ring here would throw during optimization)
        case pc @ PolygonContains(Literal(v, _), x, y) if v != null =>
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
  * or `GraftExtensions.enable(spark)` on a live session. Injects the
  * polygon-bbox optimizer rule AND registers every native expression
  * as a SQL function, so `spark.sql` users get the same surface as
  * the Column API (`SELECT geodesic_km(y1,x1,y2,x2) ...`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PolygonBBoxPushdown)
    GraftExtensions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
  }
}

object GraftExtensions {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
  import graft.functions.{DotProductExpr, GeodesicKmExpr, MinHashExpr,
    QuantizeStatsExpr, RepStatsExpr, RollingHashExpr, SimHash16Expr}

  private def d(e: Expression) = Cast(e, DoubleType)
  private def vd(e: Expression) = Cast(e, ArrayType(DoubleType))

  /** SQL-callable builders for the library's native expressions. */
  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "polygon_contains" -> { args: Seq[Expression] =>
      require(args.length == 3, "polygon_contains(wkt, x, y)")
      PolygonContains(args(0), d(args(1)), d(args(2)))
    },
    "geodesic_km" -> { args: Seq[Expression] =>
      require(args.length == 4, "geodesic_km(lat1, lon1, lat2, lon2)")
      GeodesicKmExpr(d(args(0)), d(args(1)), d(args(2)), d(args(3)))
    },
    "vec_dot" -> { args: Seq[Expression] =>
      require(args.length == 2, "vec_dot(a, b)")
      DotProductExpr(vd(args(0)), vd(args(1)))
    },
    "quantize_stats" -> { args: Seq[Expression] =>
      require(args.length == 1, "quantize_stats(vec)")
      QuantizeStatsExpr(vd(args(0)))
    },
    "rep_stats" -> { args: Seq[Expression] =>
      require(args.length == 1, "rep_stats(text)")
      RepStatsExpr(args(0))
    },
    "simhash16" -> { args: Seq[Expression] =>
      require(args.length == 1, "simhash16(tokens)")
      SimHash16Expr(args(0))
    },
    "minhash_sig" -> { args: Seq[Expression] =>
      require(args.length == 2, "minhash_sig(tokens, k)")
      args(1) match {
        case Literal(k: Int, IntegerType) => MinHashExpr(args(0), k)
        case other => throw new IllegalArgumentException(
          s"minhash_sig k must be an integer literal, got $other")
      }
    },
    "rolling_fingerprint" -> { args: Seq[Expression] =>
      require(args.length == 1 || args.length == 5,
        "rolling_fingerprint(text[, window, base, mod, divisor])")
      def intLit(e: Expression, what: String): Long = e match {
        case Literal(v: Int, IntegerType) => v.toLong
        case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
        case other => throw new IllegalArgumentException(
          s"rolling_fingerprint $what must be an integer literal, got $other")
      }
      val text = Cast(args(0), org.apache.spark.sql.types.StringType)
      if (args.length == 1) RollingHashExpr(text, 8, 257L, 1000000007L, 64L)
      else {
        val w = intLit(args(1), "window")
        // bound BEFORE the Int narrow: a BIGINT window like 2^33+2
        // would wrap to a small valid value and silently fingerprint
        // with the wrong window
        require(w >= 2 && w <= 65536,
          s"rolling_fingerprint window $w out of range [2, 65536]")
        RollingHashExpr(text, w.toInt,
          intLit(args(2), "base"), intLit(args(3), "mod"),
          intLit(args(4), "divisor"))
      }
    })

  /** Attach the rule + SQL functions to an already-running session. */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(PolygonBBoxPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PolygonBBoxPushdown
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder)
    }
  }

  /** Column-level constructor for the native expression. */
  def polygonContains(wkt: String, x: Column, y: Column): Column =
    GraftSqlBridge.column(PolygonContains(
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(wkt)),
      GraftSqlBridge.expression(x.cast("double")),
      GraftSqlBridge.expression(y.cast("double"))))
}
