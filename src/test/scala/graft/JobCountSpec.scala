package graft

import graft.drift.Drift
import graft.gen.CodeTableGen
import graft.suite.SuiteRunner
import graft.tableio.ParquetTableIO
import org.apache.spark.sql.functions._

/** Scale evidence as assertions: the job count of the hot paths must be
  * BOUNDED — independent of column width (Drift.detect) and of how many
  * batches are pending (the suite). A per-column or per-batch job loop is
  * exactly the pattern that dies at 100× scale.
  */
class JobCountSpec extends GraftSpec {

  private def countJobs(group: String)(f: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try f finally sc.clearJobGroup()
    sc.statusTracker.getJobIdsForGroup(group).length
  }

  test("Drift.detect: job count is CONSTANT in column count (no per-column fan-out)") {
    // Note: under AQE every shuffle-stage materialization is its own job,
    // so the absolute number reflects stages (measured 17 — the salted
    // two-phase categorical top-K adds two window stages), not actions
    // (5). The scale property is that the count does NOT grow with width:
    // the old implementation ran 2 + 2·#columns scans.
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val isBase = col("l_shipdate") < lit("1998-01-01").cast("timestamp")
    val n4 = countJobs("detect4") {
      Drift.detect(li, Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq("l_returnflag"), isBase)
    }
    val n8 = countJobs("detect8") {
      Drift.detect(li, Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_orderkey", "l_partkey"), Seq("l_returnflag", "l_linestatus"), isBase)
    }
    assert(n8 <= n4, s"jobs grew with column count: $n4 (4 cols) -> $n8 (8 cols)")
    assert(n4 <= 19, s"detect with 4 columns ran $n4 jobs")
  }

  test("standalone PSI: job count is CONSTANT in column count (multi forms share one melt)") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val isBase = col("l_shipdate") < lit("1998-01-01").cast("timestamp")
    val n1 = countJobs("psi1") {
      Drift.psiNumericMulti(li, Seq("l_quantity"), isBase)
    }
    val n3 = countJobs("psi3") {
      Drift.psiNumericMulti(li, Seq("l_quantity", "l_extendedprice", "l_discount"), isBase)
    }
    assert(n3 <= n1, s"numeric PSI jobs grew with column count: $n1 (1 col) -> $n3 (3 cols)")
    val c1 = countJobs("psic1") {
      Drift.psiCategoricalMulti(li, Seq("l_returnflag"), isBase)
    }
    val c2 = countJobs("psic2") {
      Drift.psiCategoricalMulti(li, Seq("l_returnflag", "l_linestatus"), isBase)
    }
    assert(c2 <= c1, s"categorical PSI jobs grew with column count: $c1 (1 col) -> $c2 (2 cols)")
  }

  test("suite: job count does not grow with the number of pending batches") {
    val code2 = CodeTableGen.generate(spark, 8000, batches = 2).cache()
    val code4 = CodeTableGen.generate(spark, 8000, batches = 4).cache()
    val dim = CodeTableGen.repoLangDim(spark)
    def run(name: String, df: org.apache.spark.sql.DataFrame): Int = countJobs(name) {
      val tmp = java.nio.file.Files.createTempDirectory(name).toString
      SuiteRunner.run(spark, df, dim, new ParquetTableIO(tmp))
    }
    val j2 = run("suite2", code2)
    val j4 = run("suite4", code4)
    code2.unpersist(); code4.unpersist()
    // AQE can add a small data-dependent number of stages; the assertion is
    // that doubling the batch count does NOT double the job count
    assert(j4 <= j2 + 2, s"suite jobs grew with batches: $j2 (2 batches) -> $j4 (4 batches)")
  }

  test("connected components: one action per round (signature materializes the lazy checkpoint)") {
    // Per round the solver runs ONE driver action — the signature collect,
    // which also materializes that round's lazy checkpoint; a dedicated
    // checkpoint job per round was pure fixed cost at the latency floor.
    // AQE is disabled for the solve so one action = one job, and
    // auto-broadcast too (at tiny test scale the static planner would
    // broadcast the mins side, and every BroadcastExchange materialization
    // is its own collect job; at real scale mins is never broadcastable).
    // The law is then exact: 1 base-signature job + 1 per round + 1 final
    // star-forest materialization. The old eager-checkpoint shape ran
    // 2 · rounds + 2.
    import spark.implicits._
    val chain = (0L until 64L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id1", "id2")
    val sc = spark.sparkContext
    val aqeKey = "spark.sql.adaptive.enabled"
    val abKey = "spark.sql.autoBroadcastJoinThreshold"
    val aqePrev = spark.conf.get(aqeKey)
    val abPrev = spark.conf.get(abKey)
    spark.conf.set(aqeKey, "false")
    spark.conf.set(abKey, "-1")
    sc.setJobGroup("cc-jobs", "cc-jobs")
    val rounds =
      try graft.dedup.Components.connectedComponentsWithRounds(chain)._2
      finally {
        sc.clearJobGroup()
        spark.conf.set(aqeKey, aqePrev); spark.conf.set(abKey, abPrev)
      }
    val jobs = sc.statusTracker.getJobIdsForGroup("cc-jobs").length
    assert(rounds >= 3, s"chain of 64 should need several rounds, took $rounds")
    assert(jobs <= rounds + 2,
      s"components ran $jobs jobs over $rounds rounds — expected one action per round")
  }
}
