package graft.operators

/** Akima sub-spline interpolation (public formulation: H. Akima 1970,
  * "A New Method of Interpolation and Smooth Curve Fitting Based on
  * Local Procedures", JACM 17(4); same method gonum/interp implements —
  * reference uses it for predict("akimaspline"), fm_monad.go:1074-1156).
  */
object Akima {
  /** Evaluate the Akima spline through (xs, ys) at x; clamps outside the
    * domain; falls back to linear for <3 knots. */
  def eval(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    val n = xs.length
    if (n == 0) return Double.NaN
    if (n == 1) return ys(0)
    if (x <= xs(0)) return ys(0)
    if (x >= xs(n - 1)) return ys(n - 1)
    if (n == 2) {
      val t = (x - xs(0)) / (xs(1) - xs(0))
      return ys(0) + t * (ys(1) - ys(0))
    }
    // segment slopes, extended by Akima's boundary extrapolation
    val m = new Array[Double](n + 3) // m(i+2) = slope of segment i
    var i = 0
    while (i < n - 1) { m(i + 2) = (ys(i + 1) - ys(i)) / (xs(i + 1) - xs(i)); i += 1 }
    m(1) = 2 * m(2) - m(3)
    m(0) = 2 * m(1) - m(2)
    m(n + 1) = 2 * m(n) - m(n - 1)
    m(n + 2) = 2 * m(n + 1) - m(n)
    // knot derivatives via Akima weights
    val t = new Array[Double](n)
    i = 0
    while (i < n) {
      val w1 = math.abs(m(i + 3) - m(i + 2))
      val w2 = math.abs(m(i + 1) - m(i))
      t(i) =
        if (w1 + w2 == 0) (m(i + 1) + m(i + 2)) / 2
        else (w1 * m(i + 1) + w2 * m(i + 2)) / (w1 + w2)
      i += 1
    }
    // locate segment (binary search)
    var lo = 0
    var hi = n - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) <= x) lo = mid else hi = mid
    }
    val h = xs(lo + 1) - xs(lo)
    val s = (x - xs(lo)) / h
    val slope = m(lo + 2)
    val p0 = ys(lo)
    val p1 = ys(lo + 1)
    // cubic Hermite on the segment with Akima derivatives
    val h00 = (1 + 2 * s) * (1 - s) * (1 - s)
    val h10 = s * (1 - s) * (1 - s)
    val h01 = s * s * (3 - 2 * s)
    val h11 = s * s * (s - 1)
    h00 * p0 + h10 * h * t(lo) + h01 * p1 + h11 * h * t(lo + 1)
  }

  /** Fritsch–Butland monotone cubic Hermite (F. Fritsch & J. Butland
    * 1984, "A Method for Constructing Local Monotone Piecewise Cubic
    * Interpolants", SIAM J. Sci. Stat. Comput. 5(2) — the reference's
    * predict("fritschbutland"), gonum interp.FritschButland). Preserves
    * monotonicity of the data; clamps outside the domain. */
  def evalFritschButland(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    val n = xs.length
    if (n == 0) return Double.NaN
    if (n == 1) return ys(0)
    if (x <= xs(0)) return ys(0)
    if (x >= xs(n - 1)) return ys(n - 1)
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val m = Array.tabulate(n - 1)(i => (ys(i + 1) - ys(i)) / h(i))
    val d = new Array[Double](n)
    d(0) = m(0)
    d(n - 1) = m(n - 2)
    var i = 1
    while (i < n - 1) {
      d(i) =
        if (m(i - 1) * m(i) <= 0) 0d
        else {
          // Fritsch–Butland weighted harmonic mean of adjacent slopes:
          // d = (w1+w2) / (w1/m_{i-1} + w2/m_i), w1=2h_i+h_{i-1}, w2=h_i+2h_{i-1}
          val w1 = 2 * h(i) + h(i - 1)
          val w2 = h(i) + 2 * h(i - 1)
          (w1 + w2) / (w1 / m(i - 1) + w2 / m(i))
        }
      i += 1
    }
    var lo = 0
    var hi = n - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) <= x) lo = mid else hi = mid
    }
    val s = (x - xs(lo)) / h(lo)
    val h00 = (1 + 2 * s) * (1 - s) * (1 - s)
    val h10 = s * (1 - s) * (1 - s)
    val h01 = s * s * (3 - 2 * s)
    val h11 = s * s * (s - 1)
    h00 * ys(lo) + h10 * h(lo) * d(lo) + h01 * ys(lo + 1) + h11 * h(lo) * d(lo + 1)
  }

  /** predict("piecewiseconstant") — RIGHT-continuous step function:
    * a gap takes the NEXT observation's value (the numerics library's
    * PiecewiseConstant predicts with the right knot — the reference
    * timewindow battery pins 270→next, not 270→previous); beyond the
    * last knot it holds the last value. */
  def evalLocf(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    val n = xs.length
    if (n == 0) return Double.NaN
    if (x <= xs(0)) return ys(0)
    if (x >= xs(n - 1)) return ys(n - 1)
    var lo = 0
    var hi = n - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) <= x) lo = mid else hi = mid
    }
    ys(hi)
  }

  /** predict("piecewiselinear") — linear interpolation between the
    * surrounding knots, clamped to the endpoints outside the domain.
    * The arithmetic keeps the `pv + (nv-pv)*(x-pt)/(nt-pt)` association
    * so results are bit-identical to the SQL-window formulation. */
  def evalLinear(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    val n = xs.length
    if (n == 0) return Double.NaN
    if (x <= xs(0)) return ys(0)
    if (x >= xs(n - 1)) return ys(n - 1)
    var lo = 0
    var hi = n - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) <= x) lo = mid else hi = mid
    }
    ys(lo) + (ys(lo + 1) - ys(lo)) * (x - xs(lo)) / (xs(lo + 1) - xs(lo))
  }

  /** Ordinary least squares over all knots, evaluated at x (the
    * reference's predict("linearregression") — gonum stat.LinearRegression
    * fit over observed points, applied to gaps AND extrapolated edges). */
  def evalLinReg(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    val n = xs.length
    if (n == 0) return Double.NaN
    if (n == 1) return ys(0)
    // centered OLS: epoch-ns x values are ~1e18, so the naive
    // n·Σx² − (Σx)² form cancels catastrophically (the variance term is
    // ~1e20 against magnitudes of ~1e37). Deviations from the mean keep
    // full precision, matching the numerics library's compensated fit.
    var mx = 0d; var my = 0d
    var i = 0
    while (i < n) { mx += xs(i); my += ys(i); i += 1 }
    mx /= n; my /= n
    var sxx = 0d; var sxy = 0d
    i = 0
    while (i < n) {
      val dx = xs(i) - mx
      sxx += dx * dx; sxy += dx * (ys(i) - my)
      i += 1
    }
    val beta = sxy / sxx
    my + beta * (x - mx)
  }

}
