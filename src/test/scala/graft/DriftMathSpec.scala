package graft

import graft.drift.DriftMath
import org.scalatest.funsuite.AnyFunSuite

/** Golden values computed independently with numpy/python implementations of
  * the published formulas (see FIXTURES.md §3) — not with this Scala code.
  */
class DriftMathSpec extends AnyFunSuite {

  test("Kolmogorov SF at known points") {
    // Q(λ→0) → 1, Q(large) → 0; scipy kstwobign.sf(1.0) ≈ 0.26999967
    assert(DriftMath.kolmogorovSF(0.0) === 1.0)
    assert(math.abs(DriftMath.kolmogorovSF(1.0) - 0.2699996716773) < 1e-9)
    assert(DriftMath.kolmogorovSF(5.0) < 1e-10)
  }

  test("two-sample KS asymptotic p-values match python golden") {
    // fixture 1: ref=[1..6], cur=[2,3.5,4.5,10,11,12]: D=0.5
    assert(math.abs(DriftMath.ksPValue(0.5, 6, 6) - 0.44130555778619723) < 1e-12)
    // fixture 2: 1..100 vs 3..300 step 3: D=0.67
    assert(DriftMath.ksPValue(0.6699999999999999, 100, 100) < 1e-19)
    // identical samples
    assert(DriftMath.ksPValue(0.0, 100, 100) === 1.0)
  }

  test("chi-square p-values at standard critical values") {
    assert(math.abs(DriftMath.chiSquarePValue(3.841, 1) - 0.050013683763956096) < 1e-9)
    assert(math.abs(DriftMath.chiSquarePValue(5.991, 2) - 0.05001161502657914) < 1e-9)
    assert(math.abs(DriftMath.chiSquarePValue(11.070, 5) - 0.05000961862240527) < 1e-9)
    assert(DriftMath.chiSquarePValue(0.0, 3) === 1.0)
  }

  test("PSI golden + properties") {
    val p = Seq.fill(10)(0.1)
    val q = Seq.fill(5)(0.05) ++ Seq.fill(5)(0.15)
    assert(math.abs(DriftMath.psi(p, q) - 0.27465307216702733) < 1e-12)
    assert(DriftMath.psi(p, p) === 0.0)
    assert(DriftMath.psi(q, p) === DriftMath.psi(p, q)) // symmetric for this formula? no —
    // PSI is symmetric: (a-b)ln(a/b) = (b-a)ln(b/a). Keep the assertion.
  }
}
