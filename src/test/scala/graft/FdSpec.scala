package graft

import graft.constraints.Constraints
import org.apache.spark.sql.functions._

/** Laws for the functional-dependency constraint: detection and weights,
  * the satisfied case, NULL-as-value semantics, composite sides, and the
  * exact two-phase plan (no countDistinct expansion).
  */
class FdSpec extends GraftSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("r1", "a.py", "python"), ("r1", "a.py", "python"),
    ("r1", "b.py", "python"), ("r1", "b.py", "rust"),   // b.py → 2 langs
    ("r2", "c.go", "go")
  ).toDF("repo", "path", "lang")

  test("violating determinants found with distinct-rhs and row weights") {
    val r = Constraints.functionalDependency(df, Seq("repo", "path"), Seq("lang"))
    assert(!r.passed && r.violationCount === 1L)
    val v = r.violations.collect().head
    assert(v.getString(0) === "r1" && v.getString(1) === "b.py")
    assert(v.getLong(2) === 2L && v.getLong(3) === 2L)
  }

  test("satisfied dependency passes with zero violations") {
    val r = Constraints.functionalDependency(
      df.where(col("lang") =!= "rust"), Seq("repo", "path"), Seq("lang"))
    assert(r.passed && r.violationCount === 0L)
    assert(r.violations.isEmpty)
  }

  test("NULL rhs is a second mapping when a non-null one exists") {
    val d = Seq(("k1", Some("x")), ("k1", None), ("k2", None))
      .toDF("k", "v")
    val r = Constraints.functionalDependency(d, Seq("k"), Seq("v"))
    assert(r.violationCount === 1L)
    assert(r.violations.collect().head.getString(0) === "k1")
  }

  test("violationCount counts determinants, not rows") {
    val d = (0 until 50).flatMap(i => Seq((s"k$i", "a"), (s"k$i", "b")))
      .toDF("k", "v")
    val r = Constraints.functionalDependency(d, Seq("k"), Seq("v"), cap = 5)
    assert(r.violationCount === 50L)            // 50 broken determinants
    assert(r.violations.count() === 5L)          // capped sample
  }

  test("plan is the exact two-phase shape: two hash aggregations, no expand") {
    val plan = Constraints.functionalDependency(
      df, Seq("repo"), Seq("lang")).violations
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"countDistinct expansion:\n$plan")
  }
}
