package graft

import graft.engine.{CubicSpline, Interp}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Kernel-level spline tests — mirrors the reference's spline unit surface
  * (tests/test_refactoring.py:118-136: gap interpolated ≈ expected ± 0.5,
  * neighbors preserved). */
class SplineSpec extends AnyFunSuite with Matchers {

  test("natural cubic spline interpolates a line exactly") {
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val ys = xs.map(x => 2.0 * x + 1.0)
    val sp = CubicSpline(xs, ys)
    sp(1.5) shouldBe (4.0 +- 1e-9)
    sp(2.5) shouldBe (6.0 +- 1e-9)
  }

  test("spline recovers a smooth curve within tolerance") {
    // sample sin(x) on a grid, knock out interior points, check recovery
    val xs = (0 to 20).map(_ * 0.3).toArray
    val ys = xs.map(math.sin)
    val sp = CubicSpline(xs, ys)
    val x = 1.95 // between knots
    sp(x) shouldBe (math.sin(x) +- 1e-3)
  }

  test("boundary extrapolation extends the end cubic (finite, sane)") {
    val xs = Array(0.0, 1.0, 2.0, 3.0)
    val ys = Array(0.0, 1.0, 4.0, 9.0) // x^2 on knots
    val sp = CubicSpline(xs, ys)
    // value just outside left edge stays near the curve's trend
    math.abs(sp(-0.1)) should be < 1.0
    sp(3.1) shouldBe (9.6 +- 1.5)
  }

  test("spline requires >= 3 points") {
    an[IllegalArgumentException] should be thrownBy
      CubicSpline(Array(0.0, 1.0), Array(1.0, 2.0))
  }

  test("linear interp handles interior and extrapolation") {
    val xs = Array(0.0, 2.0)
    val ys = Array(0.0, 4.0)
    Interp.linear(xs, ys, 1.0) shouldBe (2.0 +- 1e-12)
    Interp.linear(xs, ys, 3.0) shouldBe (6.0 +- 1e-12) // extrapolates
    Interp.linear(Array(5.0), Array(7.0), 99.0) shouldBe 7.0
  }
}
