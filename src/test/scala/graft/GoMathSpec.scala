package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GoMath

/** GoMath.sin parity with Go's math.Sin — the 16-decimal expectations come
  * from the reference's FAKE_oscillator_1 golden (tql_test.go:1939-1951),
  * which the Go runtime produced. */
class GoMathSpec extends AnyFunSuite {

  private def f16(d: Double): String =
    new java.math.BigDecimal(d).setScale(16, java.math.RoundingMode.HALF_EVEN)
      .toPlainString

  test("matches Go's sine on the oscillator golden samples (large args)") {
    val cases = Seq(
      1692329337315327000L -> "0.9169371548618853",
      1692329337515327000L -> "-0.0961529923781393",
      1692329337715327000L -> "-0.9763628786653529",
      1692329337915327000L -> "-0.5072715014883364",
      1692329338115327000L -> "0.6628509149282410")
    cases.foreach { case (ns, want) =>
      val x = 2 * math.Pi * (ns / 1e9)
      assert(f16(GoMath.sin(x)) == want, s"ns=$ns")
    }
  }

  test("agrees with Math.sin within 1 ulp on small arguments") {
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * 20
      val a = GoMath.sin(x)
      val b = Math.sin(x)
      assert(math.abs(a - b) <= Math.ulp(b), s"x=$x a=$a b=$b")
    }
  }

  test("large-argument reduction stays in range and near libm") {
    val rnd = new scala.util.Random(11)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextDouble() * 1e12 + 1e9
      val a = GoMath.sin(x)
      val b = Math.sin(x)
      assert(math.abs(a) <= 1.0)
      assert(math.abs(a - b) <= 4 * Math.ulp(1.0), s"x=$x a=$a b=$b")
    }
  }

  test("cos basics") {
    assert(GoMath.cos(0d) == 1d)
    val rnd = new scala.util.Random(13)
    (1 to 1000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * 20
      assert(math.abs(GoMath.cos(x) - Math.cos(x)) <= Math.ulp(1.0), s"x=$x")
    }
    // identity at a large argument
    val big = 1.7e9 * 2 * math.Pi
    val s = GoMath.sin(big); val c = GoMath.cos(big)
    assert(math.abs(s * s + c * c - 1.0) < 1e-15)
  }
}
