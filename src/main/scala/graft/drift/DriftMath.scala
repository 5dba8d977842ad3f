package graft.drift

/** Pure-Scala driver-side statistics math (tiny, O(#columns) calls per run).
  *
  * Conventions pinned here (FIXTURES.md §3):
  *  - KS p-value: ASYMPTOTIC Kolmogorov distribution (scipy ks_2samp
  *    method='asymp'); the reference relies on scipy defaults
  *    (DESIGN.md:559-563) which auto-switch to exact for small n — we pin
  *    asymptotic so distributed and fixture results agree at any n.
  *  - Chi-square p-value: regularized upper incomplete gamma Q(k/2, x/2).
  *  - PSI: sum((p-q) * ln(p/q)) with epsilon clamping at 1e-6.
  */
object DriftMath {

  /** Kolmogorov survival function Q(λ) = 2 Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²}. */
  def kolmogorovSF(lambda: Double): Double = {
    if (lambda <= 0) return 1.0
    var sum = 0.0
    var k = 1
    var term = Double.MaxValue
    while (k <= 100 && math.abs(term) > 1e-12) {
      term = 2.0 * (if (k % 2 == 1) 1.0 else -1.0) * math.exp(-2.0 * k * k * lambda * lambda)
      sum += term
      k += 1
    }
    math.min(1.0, math.max(0.0, sum))
  }

  /** Two-sample KS asymptotic p-value for statistic d with sample sizes n1, n2. */
  def ksPValue(d: Double, n1: Long, n2: Long): Double = {
    if (n1 == 0 || n2 == 0) return 1.0
    val ne = n1.toDouble * n2.toDouble / (n1.toDouble + n2.toDouble)
    kolmogorovSF(math.sqrt(ne) * d)
  }

  /** ln Γ(x), Lanczos approximation (g=7, n=9). */
  def logGamma(x: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    else {
      val xx = x - 1.0
      var a = g(0)
      val t = xx + 7.5
      for (i <- 1 until 9) a += g(i) / (xx + i)
      0.5 * math.log(2 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized lower incomplete gamma P(a, x) (series for x < a+1,
    * continued fraction otherwise — Numerical-Recipes structure, public
    * algorithm).
    */
  def regularizedGammaP(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0)
    if (x == 0) return 0.0
    if (x < a + 1.0) { // series
      var ap = a
      var sum = 1.0 / a
      var del = sum
      var n = 0
      while (n < 500 && math.abs(del) > math.abs(sum) * 1e-14) {
        ap += 1; del *= x / ap; sum += del; n += 1
      }
      sum * math.exp(-x + a * math.log(x) - logGamma(a))
    } else { // continued fraction for Q, return 1-Q
      var b = x + 1.0 - a
      var c = 1e300
      var d = 1.0 / b
      var h = d
      var i = 1
      var del = 10.0
      while (i < 500 && math.abs(del - 1.0) > 1e-14) {
        val an = -i * (i - a)
        b += 2.0
        d = an * d + b; if (math.abs(d) < 1e-300) d = 1e-300
        c = b + an / c; if (math.abs(c) < 1e-300) c = 1e-300
        d = 1.0 / d
        del = d * c
        h *= del
        i += 1
      }
      1.0 - h * math.exp(-x + a * math.log(x) - logGamma(a))
    }
  }

  /** Chi-square upper-tail p-value with k degrees of freedom. */
  def chiSquarePValue(statistic: Double, dof: Long): Double = {
    if (dof <= 0) return 1.0
    if (statistic <= 0) return 1.0
    math.min(1.0, math.max(0.0, 1.0 - regularizedGammaP(dof / 2.0, statistic / 2.0)))
  }

  val PsiEps = 1e-6

  /** PSI between two proportion vectors (same bin layout). */
  def psi(p: Seq[Double], q: Seq[Double]): Double = {
    require(p.length == q.length)
    p.zip(q).map { case (pi, qi) =>
      val a = math.max(pi, PsiEps)
      val b = math.max(qi, PsiEps)
      (a - b) * math.log(a / b)
    }.sum
  }
}
