package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class StudentTSpec extends AnyFunSuite {
  import StudentT._

  test("df=1 matches the Cauchy closed form") {
    // two-sided p for t(1) is 1 − (2/π)·atan(|t|)
    for (t <- Seq(0.0, 0.5, 1.0, 2.0, 12.71, 100.0)) {
      val expected = 1.0 - 2.0 / math.Pi * math.atan(t)
      assert(math.abs(twoSidedP(t, 1) - expected) < 1e-12, s"t=$t")
    }
  }

  test("df=2 matches the algebraic closed form") {
    // two-sided p for t(2) is 1 − |t|/√(2+t²)
    for (t <- Seq(0.0, 0.3, 1.0, 4.303, 50.0)) {
      val expected = 1.0 - t / math.sqrt(2.0 + t * t)
      assert(math.abs(twoSidedP(t, 2) - expected) < 1e-12, s"t=$t")
    }
  }

  test("published two-sided critical values give p = 0.05") {
    // standard t-table: t_{0.025, df}
    val critical = Seq(4 -> 2.776, 10 -> 2.228, 30 -> 2.042, 120 -> 1.980)
    for ((df, t) <- critical)
      assert(math.abs(twoSidedP(t, df) - 0.05) < 1e-3, s"df=$df")
  }

  test("large df approaches the normal distribution") {
    assert(math.abs(twoSidedP(1.959964, 1e7) - 0.05) < 1e-4)
  }

  test("limits, symmetry and monotonicity") {
    assert(twoSidedP(0.0, 5) === 1.0)
    assert(twoSidedP(Double.PositiveInfinity, 5) === 0.0)
    assert(twoSidedP(-2.5, 7) === twoSidedP(2.5, 7)) // via t² only
    val ps = (0 to 60).map(i => twoSidedP(i * 0.25, 9))
    assert(ps.zip(ps.tail).forall { case (a, b) => b < a })
    assert(twoSidedP(1.0, -1).isNaN)
  }

  test("corrT matches the r-to-t identity and its edge cases") {
    assert(math.abs(corrT(0.5, 27L) - 0.5 * math.sqrt(25.0 / 0.75)) < 1e-12)
    assert(corrT(1.0, 10L).isPosInfinity)
    assert(corrT(-1.0, 10L).isNegInfinity)
    assert(corrT(0.5, 2L).isNaN)
  }

  test("lgamma matches known values") {
    assert(math.abs(lgamma(1.0)) < 1e-13)                      // Γ(1)=1
    assert(math.abs(lgamma(0.5) - 0.5 * math.log(math.Pi)) < 1e-13)
    assert(math.abs(lgamma(6.0) - math.log(120.0)) < 1e-12)    // Γ(6)=120
  }

  test("regIncBeta matches closed forms for small parameters") {
    // I_x(1, 1) = x; I_x(1, b) = 1 − (1−x)^b; I_x(a, 1) = x^a
    for (x <- Seq(0.1, 0.35, 0.8)) {
      assert(math.abs(regIncBeta(x, 1.0, 1.0) - x) < 1e-13)
      assert(math.abs(regIncBeta(x, 1.0, 3.0)
        - (1.0 - math.pow(1.0 - x, 3))) < 1e-13)
      assert(math.abs(regIncBeta(x, 2.5, 1.0) - math.pow(x, 2.5)) < 1e-13)
    }
    assert(regIncBeta(0.0, 2.0, 3.0) === 0.0)
    assert(regIncBeta(1.0, 2.0, 3.0) === 1.0)
  }
}
