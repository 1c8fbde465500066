package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** WGS84 geodesic distance (Vincenty inverse formula, the public
  * algorithm geodesy libraries implement) — the reference measures
  * matchup distance GEODESICALLY (`Matchup.py:464-468`), while the
  * engine's default haversine assumes a sphere; the ~0.3% systematic
  * difference flips pair membership exactly at the tolerance boundary,
  * so matchup paths that need reference parity use this instead.
  *
  * Static JVM method so the Catalyst expression can call it from BOTH
  * interpreted eval and generated code — the iterative solve doesn't
  * inline into codegen templates, but a static call does.
  */
object GeoDistance {

  private val A = 6378137.0               // WGS84 semi-major (m)
  private val F = 1.0 / 298.257223563     // flattening
  private val B = A * (1 - F)             // semi-minor (m)

  /** Vincenty inverse: meters between two lat/lon (degrees) points.
    * Converges in a handful of iterations everywhere except nearly
    * antipodal pairs, where it falls back to spherical haversine (the
    * fallback is 20 000 km away from any matchup tolerance, so the
    * approximation there is irrelevant).
    */
  def vincentyM(lat1Deg: Double, lon1Deg: Double,
                lat2Deg: Double, lon2Deg: Double): Double = {
    if (lat1Deg == lat2Deg && lon1Deg == lon2Deg) return 0.0
    val u1 = math.atan((1 - F) * math.tan(math.toRadians(lat1Deg)))
    val u2 = math.atan((1 - F) * math.tan(math.toRadians(lat2Deg)))
    // wrap the lon difference into [-π, π]: a pair straddling the
    // antimeridian (179.9°, -179.9°) otherwise seeds lambda near ±2π
    // and the iteration solves the long-way-around geodesic
    val rawL = math.toRadians(lon2Deg - lon1Deg)
    val l = math.atan2(math.sin(rawL), math.cos(rawL))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)

    var lambda = l
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cos2Alpha = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 200 && !converged) {
      val sinLambda = math.sin(lambda); val cosLambda = math.cos(lambda)
      sinSigma = math.sqrt(
        math.pow(cosU2 * sinLambda, 2) +
          math.pow(cosU1 * sinU2 - sinU1 * cosU2 * cosLambda, 2))
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cos2Alpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM =
        if (cos2Alpha == 0.0) 0.0 // equatorial line
        else cosSigma - 2 * sinU1 * sinU2 / cos2Alpha
      val c = F / 16 * cos2Alpha * (4 + F * (4 - 3 * cos2Alpha))
      val prev = lambda
      lambda = l + (1 - c) * F * sinAlpha *
        (sigma + c * sinSigma *
          (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      converged = math.abs(lambda - prev) < 1e-12
      iter += 1
    }
    if (!converged) {
      // nearly antipodal: Vincenty's lambda iteration diverges; the
      // spherical value (±0.5%) is fine at 20 000 km
      return GeoFunctions.EarthRadiusKm * 1000 * haversineCentralAngle(
        lat1Deg, lon1Deg, lat2Deg, lon2Deg)
    }
    val u2t = cos2Alpha * (A * A - B * B) / (B * B)
    val bigA = 1 + u2t / 16384 * (4096 + u2t * (-768 + u2t * (320 - 175 * u2t)))
    val bigB = u2t / 1024 * (256 + u2t * (-128 + u2t * (74 - 47 * u2t)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        bigB / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) *
          (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    B * bigA * (sigma - deltaSigma)
  }

  private def haversineCentralAngle(lat1: Double, lon1: Double,
                                    lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val h = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * math.asin(math.min(1.0, math.sqrt(h)))
  }

  /** F11b — geodesic km as a Column (native codegen expression). */
  def geodesicKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    GraftSqlBridge.column(GeodesicKmExpr(
      GraftSqlBridge.expression(lat1.cast("double")),
      GraftSqlBridge.expression(lon1.cast("double")),
      GraftSqlBridge.expression(lat2.cast("double")),
      GraftSqlBridge.expression(lon2.cast("double"))))
}

/** WGS84 geodesic distance in km over four DOUBLE columns. Codegen
  * calls the static solver — one virtual-call-free invocation per row.
  */
case class GeodesicKmExpr(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "geodesic_km"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoDistance.vincentyM(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double]) / 1000.0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.GeoDistance.vincentyM($a, $b, $c, $d) / 1000.0;")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}
