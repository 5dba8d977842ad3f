package graft

import graft.gen.CodeTableGen
import org.apache.spark.sql.functions._

class GenSpec extends GraftSpec {

  lazy val df = CodeTableGen.generateWithMarkers(spark, 20000, batches = 4).cache()

  test("generator is deterministic and parallelism-independent") {
    val a = CodeTableGen.generate(spark, 2000).collect().map(_.toString).sorted.toSeq
    val b = CodeTableGen.generate(spark, 2000).repartition(7)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("mega-repo skew: repo_0000 holds roughly 30% of rows") {
    val frac = df.where(col("repo") === "repo_0000").count().toDouble / df.count()
    assert(frac > 0.25 && frac < 0.35, s"skew fraction $frac")
  }

  test("all injected violation classes are present with plausible rates") {
    val n = df.count().toDouble
    def rate(c: String) = df.where(col(c)).count() / n
    assert(rate("m_dup") > 0 && rate("m_dup") < 0.01)
    assert(rate("m_bad_lang") > 0 && rate("m_bad_lang") < 0.005)
    assert(rate("m_empty_path") > 0 && rate("m_empty_path") < 0.005)
    assert(rate("m_bad_sha") > 0 && rate("m_bad_sha") < 0.005)
    // unusual-content injection exists ONLY in the drifted (last) batch, ~5%
    assert(df.where(col("m_unusual") && col("batch_id") =!= 3).count() == 0)
    val driftN = df.where(col("batch_id") === 3).count().toDouble
    val unusualRate = df.where(col("m_unusual")).count() / driftN
    assert(unusualRate > 0.03 && unusualRate < 0.07, s"unusual rate $unusualRate")
  }

  test("duplicate rows really duplicate an existing (repo,path,commit) key") {
    val dupKeys = df.where(col("m_dup")).select("repo", "path", "commit")
    val matches = dupKeys.join(
      df.where(!col("m_dup")).select("repo", "path", "commit"),
      Seq("repo", "path", "commit"), "left_semi").count()
    assert(matches == dupKeys.count())
  }

  test("expected_sha256 equals sha2(content,256) except for injected corruption") {
    val bad = df.where(sha2(col("content"), 256) =!= col("expected_sha256"))
    assert(bad.count() == df.where(col("m_bad_sha")).count())
    assert(bad.where(!col("m_bad_sha")).count() == 0)
  }

  test("drifted batch shifts content length and lang mix") {
    val stats = df.groupBy(col("batch_id") === 3).agg(
      avg(length(col("content"))).as("mean_len")).collect()
      .map(r => r.getBoolean(0) -> r.getAs[Double]("mean_len")).toMap
    assert(stats(true) > stats(false) * 1.02)
    val mdShare = df.groupBy(col("batch_id") === 3).agg(
      avg(when(col("lang") === "markdown", 1.0).otherwise(0.0))).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(mdShare(true) > mdShare(false) * 2)
  }

  test("repo_lang dimension covers exactly the standard languages") {
    val dim = CodeTableGen.repoLangDim(spark, nRepos = 10)
    assert(dim.count() == 10 * CodeTableGen.Langs.length)
    assert(dim.select("lang").distinct().count() == 6)
  }
}
