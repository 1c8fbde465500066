package graft.functions

/** Student-t tail probability for regression significance (SURVEY A13:
  * the reference reports scipy `linregress` p-values,
  * analysis/webservice/algorithms_spark/TimeSeriesSpark.py:346-353).
  *
  * The two-sided p-value of the slope t-statistic is the regularized
  * incomplete beta function `I_x(df/2, 1/2)` at `x = df/(df + t²)` —
  * evaluated with the standard Lentz continued fraction and a Lanczos
  * log-gamma. Pure JVM math on the driver-sized aggregate row; not a
  * data-plane kernel.
  */
object StudentT {

  /** Two-sided p-value of a t-statistic with `df` degrees of freedom:
    * P(|T| >= |t|). Returns 1 at t=0, → 0 as |t| grows; NaN for df <= 0.
    */
  def twoSidedP(t: Double, df: Double): Double =
    if (df <= 0 || t.isNaN) Double.NaN
    else if (t.isInfinite) 0.0
    else regIncBeta(df / (df + t * t), df / 2.0, 0.5)

  /** The t-statistic of a Pearson correlation over n points:
    * r·√((n−2)/(1−r²)); ±∞ at |r| = 1.
    */
  def corrT(r: Double, n: Long): Double =
    if (n <= 2 || r.isNaN) Double.NaN
    else if (math.abs(r) >= 1.0) if (r > 0) Double.PositiveInfinity
                                 else Double.NegativeInfinity
    else r * math.sqrt((n - 2) / (1.0 - r * r))

  /** Regularized incomplete beta `I_x(a, b)` for x ∈ [0,1], a,b > 0. */
  def regIncBeta(x: Double, a: Double, b: Double): Double = {
    require(x >= 0.0 && x <= 1.0, s"x out of [0,1]: $x")
    if (x == 0.0) 0.0
    else if (x == 1.0) 1.0
    else {
      val lnFront = lgamma(a + b) - lgamma(a) - lgamma(b) +
        a * math.log(x) + b * math.log1p(-x)
      // use the continued fraction on the side where it converges fast
      if (x < (a + 1.0) / (a + b + 2.0))
        math.exp(lnFront) * betacf(x, a, b) / a
      else
        1.0 - math.exp(lnFront) * betacf(1.0 - x, b, a) / b
    }
  }

  /** Continued fraction for the incomplete beta (modified Lentz). */
  private def betacf(x: Double, a: Double, b: Double): Double = {
    val MaxIter = 300
    val Eps = 3e-16
    val FpMin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var del = 0.0
    do {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      del = d * c
      h *= del
      m += 1
    } while (m <= MaxIter && math.abs(del - 1.0) >= Eps)
    h
  }

  /** Lanczos log-gamma (g = 7, 9 coefficients), |rel err| < 1e-14. */
  def lgamma(x: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      // reflection: Γ(x)Γ(1−x) = π/sin(πx)
      math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgamma(1.0 - x)
    else {
      val z = x - 1.0
      var s = g(0)
      var i = 1
      while (i < 9) { s += g(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(s)
    }
  }
}
