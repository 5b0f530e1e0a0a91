package graft.engine

/** Natural cubic spline over strictly-increasing knots — the in-house kernel
  * behind W4 imputation (reference: scipy `interp1d(kind='cubic',
  * fill_value='extrapolate')` at fetch_data/common/impute_missing.py:41-98).
  *
  * Offline build ⇒ no external math dependency: this is the classic
  * tridiagonal (Thomas) solve for the second derivatives with natural
  * boundary conditions (M0 = Mn-1 = 0). Evaluation outside the knot range
  * extends the boundary cubic segment, mirroring scipy's 'extrapolate'.
  *
  * Driver-free: instances are built *inside* executor tasks
  * (Impute.splineImpute's flatMapGroups), never shipped.
  */
final class CubicSpline private (xs: Array[Double], ys: Array[Double],
                                 m: Array[Double]) {
  private val n = xs.length

  /** Evaluate at x (cubic extension beyond both ends). */
  def apply(x: Double): Double = {
    // binary search for the segment; clamp to boundary segments for
    // extrapolation (the boundary polynomial extends naturally)
    var lo = 0
    var hi = n - 2
    if (x <= xs(0)) hi = 0
    else if (x >= xs(n - 1)) lo = n - 2
    else {
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (xs(mid) <= x) lo = mid else hi = mid - 1
      }
      hi = lo
    }
    val i = lo
    val h = xs(i + 1) - xs(i)
    val a = (xs(i + 1) - x) / h
    val b = (x - xs(i)) / h
    a * ys(i) + b * ys(i + 1) +
      ((a * a * a - a) * m(i) + (b * b * b - b) * m(i + 1)) * h * h / 6.0
  }
}

object CubicSpline {
  /** Build from points sorted by x with distinct xs; requires n >= 3.
    * (n == 2 callers should use [[Interp.linear]].) */
  def apply(xs: Array[Double], ys: Array[Double]): CubicSpline = {
    val n = xs.length
    require(n >= 3, s"cubic spline needs >=3 points, got $n")
    // Solve tridiagonal system for second derivatives m(1..n-2);
    // natural boundaries m(0) = m(n-1) = 0.
    val m = new Array[Double](n)
    val sub = new Array[Double](n)   // sub-diagonal
    val diag = new Array[Double](n)  // main diagonal
    val sup = new Array[Double](n)   // super-diagonal
    val rhs = new Array[Double](n)
    var i = 1
    while (i < n - 1) {
      val h0 = xs(i) - xs(i - 1)
      val h1 = xs(i + 1) - xs(i)
      sub(i) = h0
      diag(i) = 2.0 * (h0 + h1)
      sup(i) = h1
      rhs(i) = 6.0 * ((ys(i + 1) - ys(i)) / h1 - (ys(i) - ys(i - 1)) / h0)
      i += 1
    }
    // Thomas forward sweep over rows 1..n-2
    i = 2
    while (i < n - 1) {
      val w = sub(i) / diag(i - 1)
      diag(i) -= w * sup(i - 1)
      rhs(i) -= w * rhs(i - 1)
      i += 1
    }
    // back substitution
    i = n - 2
    while (i >= 1) {
      m(i) = (rhs(i) - sup(i) * (if (i + 1 <= n - 2) m(i + 1) else 0.0)) / diag(i)
      i -= 1
    }
    new CubicSpline(xs, ys, m)
  }
}

/** Two-point linear interpolation/extrapolation — the reference's fallback
  * when a gap has fewer than 4 usable neighbors (impute_missing.py:56-65,
  * `np.interp` path). */
object Interp {
  def linear(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    val n = xs.length
    if (n == 1) return ys(0)
    // nearest segment (handles extrapolation on both sides)
    var i = 0
    while (i < n - 2 && xs(i + 1) < x) i += 1
    val slope = (ys(i + 1) - ys(i)) / (xs(i + 1) - xs(i))
    ys(i) + slope * (x - xs(i))
  }
}
