package graft

import graft.stats.Outliers
import org.apache.spark.sql.functions._

/** Laws for row-level outlier flags: hand-computed fences on the exact
  * interpolated percentile, planted-extreme detection by both rules, the
  * null and zero-sigma conventions, and the lazy one-scan broadcast plan.
  */
class OutliersSpec extends GraftSpec {
  import spark.implicits._

  test("hand-computed Tukey fences on interpolated quartiles; extreme flagged by both rules") {
    // values 1..4 plus 100: Q1 = 2 (pos 0.25·4 = 1), Q3 = 4 (pos 3),
    // IQR = 2 → fences [-1, 7]; 100 is also a z outlier
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val f = Outliers.flag(df, "v").collect()
      .map(r => r.getDouble(0) -> r).toMap
    assert(f(100.0).getDouble(1) === -1.0)                  // lo_fence
    assert(f(100.0).getDouble(2) === 7.0)                   // hi_fence
    assert(f(100.0).getBoolean(3))                          // iqr flag
    // at n=5 the single extreme inflates σ so much its own z is only
    // ~1.8 — the textbook masking weakness of the z rule (and why the
    // IQR rule, robust to the extreme, still flags it)
    assert(!f(100.0).getBoolean(5))
    assert(Seq(1.0, 2.0, 3.0, 4.0).forall(v => !f(v).getBoolean(3)))
  }

  test("z rule fires once the sample is large enough to absorb the inflation") {
    val df = ((1 to 30).map(_.toDouble) :+ 1000.0).toDF("v")
    val flagged = Outliers.flag(df, "v").where(col("is_outlier_z"))
      .select("v").as[Double].collect().toSeq
    assert(flagged === Seq(1000.0))
  }

  test("null values: false flags, null z (missing is completeness, not outlier)") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v")
    val r = Outliers.flag(df, "v").where(col("v").isNull).collect().head
    assert(!r.getBoolean(3) && !r.getBoolean(5) && r.isNullAt(4))
  }

  test("constant column: degenerate fences flag nothing, z is null") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val rows = Outliers.flag(df, "v").collect()
    rows.foreach { r =>
      assert(!r.getBoolean(3) && !r.getBoolean(5) && r.isNullAt(4))
    }
  }

  test("lazy one-scan plan: scalars re-attach by broadcast, no shuffle join") {
    val plan = Outliers.flag(spark.range(100).select(col("id").cast("double").as("v")), "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"no broadcast re-attach:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"shuffled the scalar join:\n$plan")
  }
}
