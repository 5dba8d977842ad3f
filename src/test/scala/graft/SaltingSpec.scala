package graft

import graft.gen.CodeTableGen
import graft.stats.FreqSketch
import graft.suite.Salting
import org.apache.spark.sql.functions._

/** Laws for the adaptive salting path: exactness is independent of the hot
  * set (any salt assignment is a valid two-level split of a mergeable
  * aggregate), the level-1 partial volume collapses to one row per cold
  * key, and the freq-sketch cut names the mega-repo that must be salted.
  */
class SaltingSpec extends GraftSpec {
  import spark.implicits._

  // skewed corpus: the generator's repo_0000 holds ~30% of rows
  private lazy val code = CodeTableGen.generate(spark, 12000, batches = 2).cache()

  private def plainCounts = code.groupBy("repo").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def adaptive(hot: Seq[String]) =
    Salting.adaptiveSaltedCount(code, "repo", hot,
        saltSource = Seq("path", "commit"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("adaptive salted counts are exact for ANY hot set") {
    val truth = plainCounts
    val allRepos = truth.keys.toSeq.sorted
    // empty, the true mega-repo, an adversarially wrong set (cold keys +
    // keys not in the data), everything
    assert(adaptive(Seq.empty) == truth)
    assert(adaptive(Seq("repo_0000")) == truth)
    assert(adaptive(Seq("repo_0099", "no_such_repo")) == truth)
    assert(adaptive(allRepos) == truth)
  }

  test("level-1 partial volume: one row per cold key, buckets only for hot") {
    val distinctRepos = code.select("repo").distinct().count()
    val saltSrc = Seq(col("path"), col("commit"))
    def level1Rows(salt: org.apache.spark.sql.Column): Long =
      Salting.countPartials(code.repartition(8), "repo", salt).count()
    // static: every repo splinters into up to SaltBuckets partials
    val staticRows = level1Rows(
      pmod(xxhash64(saltSrc: _*), lit(Salting.DefaultBuckets)))
    // adaptive with one hot repo: cold repos contribute exactly 1 row each
    val adaptiveRows = level1Rows(Salting.adaptiveSaltCol(
      col("repo"), Seq("repo_0000"), Salting.DefaultBuckets, saltSrc))
    assert(adaptiveRows <= distinctRepos - 1 + Salting.DefaultBuckets,
      s"adaptive $adaptiveRows vs distinct $distinctRepos")
    // the static path really does pay the multiplier this spec guards
    // against (mega-repo + populous mid-tail repos all splinter)
    assert(staticRows > 2 * adaptiveRows,
      s"static $staticRows should far exceed adaptive $adaptiveRows")
  }

  test("freq-sketch NO_FALSE_NEGATIVES cut names the mega-repo at the suite threshold") {
    val bytes = code
      .agg(FreqSketch.freqItemsAgg(col("repo"), graft.suite.SuiteConfig.FreqMapSize))
      .collect()(0).getAs[Array[Byte]](0)
    val rows = code.count()
    val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val hot = FreqSketch.hotKeys(bytes, math.max(1L, rows / shuffleParts))
    assert(hot.contains("repo_0000"), s"hot set $hot must include the mega-repo")
    // hot set is a cut, not the whole key space
    assert(hot.size < code.select("repo").distinct().count())
  }
}
