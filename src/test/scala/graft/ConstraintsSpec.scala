package graft

import graft.constraints.Constraints
import graft.gen.CodeTableGen
import org.apache.spark.sql.functions._

class ConstraintsSpec extends GraftSpec {
  import spark.implicits._

  lazy val marked = CodeTableGen.generateWithMarkers(spark, 20000).cache()
  lazy val code = marked.drop("m_dup", "m_bad_lang", "m_empty_path", "m_bad_sha", "m_unusual", "id")

  test("uniqueness finds exactly the injected duplicate keys") {
    val expected = marked.where(col("m_dup")).count()
    val r = Constraints.uniqueness(code, Seq("repo", "path", "commit"))
    assert(!r.passed)
    assert(r.violationCount == expected)
    assert(r.violations.columns.toSeq == Seq("repo", "path", "commit", "dup_count"))
  }

  test("referential finds exactly the injected bad-lang rows") {
    val expected = marked.where(col("m_bad_lang")).count()
    val dim = CodeTableGen.repoLangDim(spark)
    val r = Constraints.referential(code, dim, Seq("repo", "lang"))
    assert(!r.passed && r.violationCount == expected)
  }

  test("completeness: empty-string path counts as missing (isnull ∨ '')") {
    val expected = marked.where(col("m_empty_path")).count()
    val r = Constraints.completeness(code, Map("path" -> 0.0, "repo" -> 0.0))
    assert(!r.passed && r.violationCount == expected)
    val ok = Constraints.completeness(code, Map("repo" -> 0.0))
    assert(ok.passed)
  }

  test("sha256 invariant finds exactly the corrupted digests") {
    val expected = marked.where(col("m_bad_sha")).count()
    val r = Constraints.sha256Invariant(code, "content", "expected_sha256",
      Seq("repo", "path", "commit"))
    assert(!r.passed && r.violationCount == expected)
  }

  test("conditional range expectation (GE row_condition semantics)") {
    // traffic ∈ [0,500], temperature ∈ [-20,50] — DESIGN.md:366-380
    val df = Seq(
      ("traffic", 100.0), ("traffic", 501.0), ("traffic", -1.0),
      ("temperature", 25.0), ("temperature", 60.0), ("other", 9999.0)
    ).toDF("type", "value")
    val t1 = Constraints.conditionalRange(df, col("type") === "traffic", "value", 0, 500, Seq("type"))
    assert(!t1.passed && t1.violationCount == 2)
    val t2 = Constraints.conditionalRange(df, col("type") === "temperature", "value", -20, 50, Seq("type"))
    assert(!t2.passed && t2.violationCount == 1)
    val t3 = Constraints.conditionalRange(df, col("type") === "other", "value", 0, 10000, Seq("type"))
    assert(t3.passed && t3.violationCount == 0)
  }

  test("violation samples are capped and deterministic") {
    val r = Constraints.uniqueness(code, Seq("repo", "path", "commit"), cap = 5)
    val s1 = r.violations.collect().map(_.toString).toSeq
    val s2 = Constraints.uniqueness(code, Seq("repo", "path", "commit"), cap = 5)
      .violations.collect().map(_.toString).toSeq
    assert(s1.length <= 5 && s1 == s2)
  }
}
