package graft

import graft.drift.Drift

/** Regression: chiSqGof must sum coverage over the key SEQUENCE — mapping
  * the key SET to counts collapsed equal counts (e.g. a uniform top-K from
  * the capped categorical path) and silently shrank n2cov.
  */
class ChiGofRegressionSpec extends GraftSpec {
  test("chiSqGof coverage total is correct when many categories share a count") {
    val ref = Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 7L)
    val cur = Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 14L)
    // proportions identical (1:1:1:7 both sides) -> stat must be exactly 0
    val (stat, p, dof) = Drift.chiSqGof(ref, cur)
    assert(stat == 0.0, s"stat=$stat (set-collapse would make n2cov=16, stat>0)")
    assert(p == 1.0)
    assert(dof == 3)
  }

  test("suite chiSqFromCounts has the same fix (drift_chisq verdict path)") {
    // two langs tied at the same current count must both count toward
    // coverage; identical proportions -> stat exactly 0, V exactly 0
    val ref = Map("scala" -> 10L, "java" -> 10L, "python" -> 20L)
    val cur = Map("scala" -> 30L, "java" -> 30L, "python" -> 60L)
    val (stat, p, v) = graft.suite.SuiteRunner.chiSqFromCounts(ref, cur)
    assert(stat == 0.0, s"stat=$stat (set-collapse would shrink n2cov to 90)")
    assert(p == 1.0)
    assert(v == 0.0)
  }
}
