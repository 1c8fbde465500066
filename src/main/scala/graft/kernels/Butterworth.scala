package graft.kernels

/** Digital Butterworth low-pass + zero-phase forward-backward filtering
  * (W7 reference parity: `Filtering.py:87-97` runs scipy
  * `butter(order, cutoff)` + `filtfilt`). This is the DRIVER-SIDE exact
  * twin for collected series (a daily time series is thousands of
  * points — the reference collects it too); the distributed
  * zero-phase MA cascade in [[SeriesFilters]] remains the large-series
  * path.
  *
  * Both halves implement the public, textbook algorithms scipy uses:
  *  - design: analog Butterworth prototype poles
  *    exp(iπ(2k+N−1)/2N), frequency pre-warp 4·tan(πWn/2), bilinear
  *    transform at fs=2, N digital zeros at z=−1, gain normalized to
  *    unity at DC — identical coefficients to scipy.signal.butter
  *    (verified against the published butter(4, 0.2) values).
  *  - filtfilt: odd extension of length 3·(ntaps) at both ends,
  *    steady-state initial conditions (lfilter_zi: the direct-form-II
  *    transposed state that makes a step input transient-free), one
  *    forward and one reverse lfilter pass — scipy's default padding
  *    behavior.
  */
object Butterworth {

  /** (b, a) coefficients of an order-N digital Butterworth low-pass
    * with cutoff `wn` in (0, 1), as a fraction of the Nyquist rate —
    * scipy.signal.butter's convention.
    */
  def butter(order: Int, wn: Double): (Array[Double], Array[Double]) = {
    require(order >= 1 && wn > 0 && wn < 1, s"butter: bad order=$order wn=$wn")
    // analog prototype poles on the unit circle's left half
    val proto = (1 to order).map { k =>
      val theta = math.Pi * (2 * k + order - 1) / (2.0 * order)
      (math.cos(theta), math.sin(theta))
    }
    // pre-warp (fs = 2 in scipy's bilinear) and scale the prototype
    val warped = 4.0 * math.tan(math.Pi * wn / 2.0)
    val poles = proto.map { case (re, im) => (re * warped, im * warped) }
    // bilinear: z = (4 + s) / (4 - s)
    val zPoles = poles.map { case (re, im) =>
      // (4 + s) / (4 - s) complex division
      val (nr, ni) = (4.0 + re, im)
      val (dr, di) = (4.0 - re, -im)
      val d2 = dr * dr + di * di
      ((nr * dr + ni * di) / d2, (ni * dr - nr * di) / d2)
    }
    // a(z) from the digital poles; b(z) = k · (z + 1)^N
    val a = polyFromRoots(zPoles)
    val b0 = binomial(order)
    // unity DC gain: H(1) = sum(b)/sum(a) = 1
    val k = a.sum / b0.sum
    (b0.map(_ * k), a)
  }

  /** Real polynomial coefficients (highest order first, monic) from
    * complex roots that come in conjugate pairs.
    */
  private def polyFromRoots(roots: Seq[(Double, Double)]): Array[Double] = {
    var coeffs = Array((1.0, 0.0)) // complex coefficients, degree 0
    roots.foreach { case (rr, ri) =>
      val next = Array.fill(coeffs.length + 1)((0.0, 0.0))
      for (i <- coeffs.indices) {
        val (cr, ci) = coeffs(i)
        // shift (multiply by z)
        next(i) = (next(i)._1 + cr, next(i)._2 + ci)
        // times (-root)
        val mr = -(cr * rr - ci * ri)
        val mi = -(cr * ri + ci * rr)
        next(i + 1) = (next(i + 1)._1 + mr, next(i + 1)._2 + mi)
      }
      coeffs = next
    }
    coeffs.map(_._1) // conjugate pairs ⇒ imaginary parts cancel
  }

  /** Coefficients of (z + 1)^n, highest order first. */
  private def binomial(n: Int): Array[Double] = {
    val c = new Array[Double](n + 1)
    c(0) = 1.0
    for (i <- 1 to n; j <- (1 to i).reverse) c(j) += c(j - 1)
    c
  }

  /** Direct-form-II-transposed IIR filter with initial state `zi`
    * (scipy.signal.lfilter). Returns the filtered signal; mutates a
    * copy of zi only.
    */
  def lfilter(b: Array[Double], a: Array[Double], x: Array[Double],
              zi: Array[Double]): Array[Double] = {
    val n = b.length
    val z = zi.clone()
    val y = new Array[Double](x.length)
    var m = 0
    while (m < x.length) {
      val xm = x(m)
      val ym = b(0) * xm + z(0)
      var i = 0
      while (i < n - 2) {
        z(i) = b(i + 1) * xm + z(i + 1) - a(i + 1) * ym
        i += 1
      }
      z(n - 2) = b(n - 1) * xm - a(n - 1) * ym
      y(m) = ym
      m += 1
    }
    y
  }

  /** Steady-state lfilter initial conditions for a unit step
    * (scipy.signal.lfilter_zi): solve (I − Aᵀ) zi = B with A the
    * companion matrix of `a`, B = b[1:] − a[1:]·b[0].
    */
  def lfilterZi(b: Array[Double], a: Array[Double]): Array[Double] = {
    val n = a.length - 1
    val m = breeze.linalg.DenseMatrix.zeros[Double](n, n)
    // I - companion(a).T ; companion first row = -a[1:]/a[0], subdiag 1
    for (i <- 0 until n; j <- 0 until n) {
      val compTji =
        if (j == 0) -a(i + 1) / a(0)          // companion(a)[0, i] → T[i, 0]
        else if (i == j - 1) 1.0              // subdiagonal → T[j-1, j]
        else 0.0
      m(i, j) = (if (i == j) 1.0 else 0.0) - compTji
    }
    val rhs = breeze.linalg.DenseVector.tabulate(n)(i => b(i + 1) - a(i + 1) * b(0))
    (m \ rhs).toArray
  }

  /** Zero-phase filtering (scipy.signal.filtfilt, default odd padding):
    * odd-extend by 3·ntaps, forward pass seeded with zi·x₀, reverse
    * pass seeded with zi·y_last, un-extend.
    */
  def filtfilt(b: Array[Double], a: Array[Double], x: Array[Double]): Array[Double] = {
    val edge = 3 * math.max(b.length, a.length)
    require(x.length > edge,
      s"filtfilt: series length ${x.length} must exceed pad length $edge")
    val ext = new Array[Double](x.length + 2 * edge)
    for (i <- 0 until edge) ext(i) = 2 * x(0) - x(edge - i)
    System.arraycopy(x, 0, ext, edge, x.length)
    for (i <- 0 until edge)
      ext(edge + x.length + i) = 2 * x(x.length - 1) - x(x.length - 2 - i)
    val zi = lfilterZi(b, a)
    val fwd = lfilter(b, a, ext, zi.map(_ * ext(0)))
    val rev = fwd.reverse
    val bwd = lfilter(b, a, rev, zi.map(_ * rev(0))).reverse
    java.util.Arrays.copyOfRange(bwd, edge, edge + x.length)
  }

  /** W7 driver-side path: 4th-order Butterworth low-pass, zero phase —
    * the reference's exact filter on a collected series.
    */
  def lowpassDriver(series: Array[Double], cutoffWn: Double,
                    order: Int = 4): Array[Double] = {
    val (b, a) = butter(order, cutoffWn)
    filtfilt(b, a, series)
  }
}
