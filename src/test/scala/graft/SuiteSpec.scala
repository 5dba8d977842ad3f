package graft

import graft.gen.CodeTableGen
import graft.suite.{SuiteRunner, Verdict}
import graft.tableio.ParquetTableIO
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import java.util.Comparator

class SuiteSpec extends GraftSpec {

  private def tempDir(): String =
    Files.createTempDirectory("graft_suite").toString

  private def rmdir(p: String): Unit = {
    val d = Path.of(p)
    if (Files.exists(d))
      Files.walk(d).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
  }

  lazy val code = CodeTableGen.generate(spark, 20000, batches = 4).cache()
  lazy val dim = CodeTableGen.repoLangDim(spark)

  test("end-to-end: violations detected, drifted batch fails drift, baseline passes") {
    val root = tempDir()
    try {
      val io = new ParquetTableIO(root)
      val verdicts = SuiteRunner.run(spark, code, dim, io)
      assert(verdicts.nonEmpty)
      def v(b: Long, check: String, colName: String): Verdict =
        verdicts.find(x => x.batch_id == b && x.check == check && x.column == colName).get

      // constraints fire in every batch (violations are injected uniformly)
      (0L to 3L).foreach { b =>
        assert(!v(b, "uniqueness", "repo,path,commit").passed)
        assert(!v(b, "referential", "repo,lang").passed)
        assert(!v(b, "sha256_invariant", "content").passed)
        assert(v(b, "quality_score", "*").metric == 0.0) // gated: constraints failed
      }
      // baseline batch trivially passes drift; undrifted batches pass; batch 3 drifts
      assert(v(0, "drift_ks", "content_length").passed)
      assert(v(1, "drift_ks", "content_length").passed, "undrifted batch must not fire KS")
      assert(v(2, "drift_ks", "content_length").passed)
      assert(!v(3, "drift_ks", "content_length").passed, "drifted batch must fire KS")
      assert(!v(3, "drift_chisq", "lang").passed, "lang-mix shift must fire chi-square")
      assert(!v(3, "drift_psi", "lang").passed)
      assert(v(1, "drift_psi", "lang").passed)
      assert(v(3, "mean_shift", "content_length").metric >
        v(1, "mean_shift", "content_length").metric)

      // audit artifacts exist and are readable
      assert(io.listCommitted("verdicts") == Seq(0L, 1L, 2L, 3L))
      val persisted = io.readCommitted(spark, "verdicts").get
      assert(persisted.count() == verdicts.size)
      val viol = io.readCommitted(spark, "violations_uniqueness").get
      assert(viol.count() > 0)
      val lineage = io.readCommitted(spark, "lineage").get
      assert(lineage.count() == 4)
      assert(lineage.select("row_count").collect().map(_.getLong(0)).sum == 20000L)
    } finally rmdir(root)
  }

  test("resume: killed run re-validates ONLY uncommitted batches, final audit identical") {
    val rootA = tempDir(); val rootB = tempDir()
    try {
      val ioA = new ParquetTableIO(rootA)
      SuiteRunner.run(spark, code, dim, ioA)
      val full = ioA.readCommitted(spark, "verdicts").get
        .orderBy("batch_id", "check", "column").collect().map(_.toString).toSeq

      // simulate a kill after batches 0,1: run, then delete commits 2,3
      val ioB = new ParquetTableIO(rootB)
      SuiteRunner.run(spark, code, dim, ioB)
      Seq(2L, 3L).foreach { b =>
        Files.delete(Path.of(s"$rootB/verdicts/_manifest/p$b.json"))
      }
      assert(ioB.listCommitted("verdicts") == Seq(0L, 1L))
      val resumed = SuiteRunner.run(spark, code, dim, ioB)
      assert(resumed.map(_.batch_id).distinct.sorted == Seq(2L, 3L), "must only touch pending batches")
      val after = ioB.readCommitted(spark, "verdicts").get
        .orderBy("batch_id", "check", "column").collect().map(_.toString).toSeq
      assert(after == full, "resumed audit must equal single-run audit")

      // idempotence: nothing pending → no-op
      assert(SuiteRunner.run(spark, code, dim, ioB).isEmpty)
    } finally { rmdir(rootA); rmdir(rootB) }
  }

  test("committed sketches merge to whole-table answers without re-scanning") {
    val root = tempDir()
    try {
      val io = new ParquetTableIO(root)
      SuiteRunner.run(spark, code, dim, io)
      val g = graft.audit.AuditQueries.globalDistinct(spark, io).get.collect()(0)
      val exactKeys = code.select("repo", "path", "commit").distinct().count()
      val approxKeys = g.getAs[Long]("distinct_keys").toDouble
      assert(math.abs(approxKeys - exactKeys) / exactKeys < 0.05,
        s"hll $approxKeys vs exact $exactKeys")
      assert(g.getAs[Long]("total_rows") == 20000L)
      val qs = graft.audit.AuditQueries.globalLengthQuantiles(spark, io).get
      val exactMedian = code.select(median(length(col("content")))).collect()(0).getDouble(0)
      assert(math.abs(qs(0.5) - exactMedian) / exactMedian < 0.1,
        s"t-digest p50 ${qs(0.5)} vs exact $exactMedian")
    } finally rmdir(root)
  }

  test("audit-only drift: sketched KS between committed batches flags the drifted one") {
    val root = tempDir()
    try {
      val io = new ParquetTableIO(root)
      SuiteRunner.run(spark, code, dim, io)
      val undrifted = graft.audit.AuditQueries.ksBetweenBatches(spark, io, 0L, 1L).get
      val drifted = graft.audit.AuditQueries.ksBetweenBatches(spark, io, 0L, 3L).get
      assert(drifted.statistic > undrifted.statistic)
      assert(drifted.pValue < 0.05, s"drifted batch must flag: $drifted")
      assert(undrifted.pValue >= 0.05, s"undrifted batch must not: $undrifted")
      assert(graft.audit.AuditQueries.ksBetweenBatches(spark, io, 0L, 99L).isEmpty)
    } finally rmdir(root)
  }

  test("suite's salted repo_metrics equal plain groupBy counts and rank the mega-repo first") {
    val root = tempDir()
    try {
      val io = new ParquetTableIO(root)
      SuiteRunner.run(spark, code, dim, io)
      val rm = io.readCommitted(spark, "repo_metrics").get
      val top = rm.where(col("rank") === 1).select("repo").distinct().collect()
      assert(top.forall(_.getString(0) == "repo_0000"), "mega-repo must rank first per batch")
      val plain = code.groupBy("batch_id", "repo").count()
      val joined = rm.join(plain, Seq("batch_id", "repo"))
        .where(col("file_count") =!= col("count")).count()
      assert(joined == 0, "salted two-level counts must be exact")

      // cross-batch heavy hitters from the committed freq_repo bytes:
      // in the exact regime (distinct repos < FreqMapSize) the merged
      // estimates equal whole-table exact counts, mega-repo first
      val truth = code.groupBy("repo").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val hot = graft.audit.AuditQueries.hotRepos(spark, io, threshold = 50L).get
      assert(hot.nonEmpty && hot.head._1 == "repo_0000")
      hot.foreach { case (repo, est, lb, ub) =>
        assert(est == truth(repo) && lb == est && ub == est,
          s"$repo: est $est lb $lb ub $ub vs true ${truth(repo)}")
      }
      assert(hot.map(_._1).toSet == truth.filter(_._2 >= 50L).keySet)
    } finally rmdir(root)
  }

  test("above the length-cardinality cap: no per-length driver collect; sketched KS/PSI verdicts agree") {
    val root = tempDir()
    try {
      val io = new ParquetTableIO(root)
      // cap=4 forces the sketched path (the corpus has thousands of distinct lengths)
      val verdicts = SuiteRunner.run(spark, code, dim, io, lenCardCap = 4)
      def v(b: Long, check: String, colName: String): Verdict =
        verdicts.find(x => x.batch_id == b && x.check == check && x.column == colName).get
      // the routing decision drops the length counts entirely
      val arts = SuiteRunner.collectArtifacts(
        code.withColumn("batch_id", col("batch_id").cast("bigint")),
        Seq(0L, 1L, 2L, 3L), lenCardCap = 4)
      assert(arts.values.forall(_.lenCounts.isEmpty),
        "per-length counts must never be collected above the cap")
      assert(arts.values.forall(_.lenCardApprox > 4))
      // same verdict rows, same drift conclusions as the exact path
      assert(v(1, "drift_ks", "content_length").passed, "undrifted batch must pass sketched KS")
      assert(v(2, "drift_ks", "content_length").passed)
      assert(!v(3, "drift_ks", "content_length").passed, "drifted batch must fire sketched KS")
      assert(v(1, "drift_psi", "content_length").passed)
      assert(!v(3, "drift_chisq", "lang").passed)
      // identical verdict-table shape either way
      val exact = {
        val r2 = tempDir()
        try SuiteRunner.run(spark, code, dim, new ParquetTableIO(r2))
        finally rmdir(r2)
      }
      assert(verdicts.map(x => (x.batch_id, x.check, x.column)).sorted ==
        exact.map(x => (x.batch_id, x.check, x.column)).sorted)
    } finally rmdir(root)
  }

  test("resume without the baseline partition: reference loads from committed artifacts") {
    val root = tempDir()
    try {
      val io = new ParquetTableIO(root)
      // first run validates the baseline (+ batch 1) and commits artifacts
      SuiteRunner.run(spark, code.where(col("batch_id") < 2), dim, io)
      assert(io.listCommitted("verdicts") == Seq(0L, 1L))
      assert(io.isCommitted("artifacts", 0L))
      // later arrival carries ONLY batches 2,3 — the baseline reference
      // must come from the committed artifacts snapshot, not a re-scan
      val resumed = SuiteRunner.run(spark, code.where(col("batch_id") >= 2), dim, io)
      assert(resumed.map(_.batch_id).distinct.sorted == Seq(2L, 3L))
      // drift verdicts identical to an all-batches-at-once run
      val full = {
        val r2 = tempDir()
        try SuiteRunner.run(spark, code, dim, new ParquetTableIO(r2))
        finally rmdir(r2)
      }
      def key(v: Verdict) = (v.batch_id, v.check, v.column)
      val fullMap = full.filter(_.batch_id >= 2)
        .map(v => key(v) -> (v.metric, v.p_value.toString, v.passed)).toMap
      resumed.foreach { v =>
        assert(fullMap(key(v)) == ((v.metric, v.p_value.toString, v.passed)), s"mismatch: $v")
      }
    } finally rmdir(root)
  }

  test("version-gated artifacts are re-stamped after a recompute: upgraded audit dirs reload, not crash") {
    val root = tempDir()
    try {
      val io = new ParquetTableIO(root)
      SuiteRunner.run(spark, code.where(col("batch_id") < 2), dim, io)
      // simulate a PRE-UPGRADE audit dir: the baseline's artifacts commit
      // meta lacks the current suite version, so the gate must reject it
      Files.writeString(Path.of(s"$root/artifacts/_manifest/p0.json"),
        """{"batch_id":0}""")
      // a run whose input still carries the baseline partition recomputes
      // the reference AND must re-stamp the snapshot under the current
      // version (batch 2 is the only pending batch)
      SuiteRunner.run(spark, code.where(col("batch_id") <= 2), dim, io)
      assert(Files.readString(Path.of(s"$root/artifacts/_manifest/p0.json"))
        .contains("\"suite\""), "baseline artifacts not re-stamped")
      // the decisive leg: input WITHOUT the baseline partition — before the
      // re-stamp path this threw (gate rejects, nothing to re-scan)
      val resumed = SuiteRunner.run(spark, code.where(col("batch_id") === 3), dim, io)
      assert(resumed.map(_.batch_id).distinct == Seq(3L))
      // verdicts equal the all-at-once run (the reloaded snapshot is real)
      val full = {
        val r2 = tempDir()
        try SuiteRunner.run(spark, code, dim, new ParquetTableIO(r2))
        finally rmdir(r2)
      }
      val fullMap = full.filter(_.batch_id == 3)
        .map(v => (v.check, v.column) -> (v.metric, v.p_value.toString, v.passed)).toMap
      resumed.foreach { v =>
        assert(fullMap((v.check, v.column)) == ((v.metric, v.p_value.toString, v.passed)),
          s"mismatch: $v")
      }
    } finally rmdir(root)
  }

  test("missing baseline batch fails fast with a clear message") {
    val root = tempDir()
    try {
      val io = new ParquetTableIO(root)
      val noBase = code.where(col("batch_id") =!= 0)
      val e = intercept[IllegalArgumentException] {
        SuiteRunner.run(spark, noBase, dim, io)
      }
      assert(e.getMessage.contains("baseline batch 0"), e.getMessage)
    } finally rmdir(root)
  }

  test("one-pass sha sample equals the two-phase ORDER BY ... LIMIT cap sample") {
    val arts = SuiteRunner.collectArtifacts(
      code.withColumn("batch_id", col("batch_id").cast("bigint")), Seq(0L))
    // samples are JSON key triples (NUL-safe round-trip); MinK keeps the
    // lexicographically-least cap of exactly these strings
    val got = arts(0L).shaSamples
    val expected = code
      .where(col("batch_id") === 0 && sha2(col("content"), 256) =!= col("expected_sha256"))
      .select(to_json(struct(col("repo"), col("path"), col("commit"))).as("j"))
      .distinct().orderBy("j")
      .limit(graft.suite.SuiteConfig.ViolationCap)
      .collect().map(_.getString(0)).toSeq
    assert(got == expected)
    assert(arts(0L).shaMismatch > 0)
  }

  test("sha-sample key triple round-trips a NUL / control char in path exactly") {
    import spark.implicits._
    val weird = "dir\u0000a/fi\u0001le.scala" // NUL mis-split was the old failure mode
    val df = Seq(
      ("repo_x", weird, "c" * 40, "scala", "body", "not_the_sha", 0L),
      ("repo_y", "ok/path.scala", "d" * 40, "scala", "body2", "also_wrong", 0L))
      .toDF("repo", "path", "commit", "lang", "content", "expected_sha256", "batch_id")
    val arts = SuiteRunner.collectArtifacts(df, Seq(0L))
    val parsed = spark.createDataset(arts(0L).shaSamples).toDF("j")
      .select(from_json(col("j"), "repo STRING, path STRING, commit STRING",
        java.util.Map.of[String, String]).as("k"))
      .select("k.repo", "k.path", "k.commit")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(parsed.contains(("repo_x", weird, "c" * 40)), parsed)
    assert(parsed.contains(("repo_y", "ok/path.scala", "d" * 40)))
  }

  test("salted per-repo counts equal plain groupBy counts (exactness under skew)") {
    val plain = code.groupBy("repo").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.suite.Salting
      .saltedCount(code, "repo", saltSource = Seq("path", "commit"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
