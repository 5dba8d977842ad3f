package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tableio.ParquetTableIO

/** Suite-only wall-clock profile: N timed full runs (first run = JIT warm-up,
  * excluded) over SPARK_GRAFT_INPUT at SPARK_GRAFT_CPUS. Prints min/median.
  */
object ProfileSuite {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val input = sys.env.getOrElse("SPARK_GRAFT_INPUT", "/tmp/graft_bench_input_8000000")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // shuffle files live until ContextCleaner notices their dependency
      // objects are garbage; the 30 min default lets 3-4 large-input runs'
      // shuffles accumulate on disk simultaneously (measured: ~14 GB/run at
      // 320M rows — filled the sandbox disk and killed the run with ENOSPC)
      .config("spark.cleaner.periodicGC.interval", "120s")
      // zstd for shuffle/spill (lz4 default): ONE run's live shuffle files
      // + cache spill at 288M rows exceed this sandbox's ~38 GB of scratch
      // headroom under lz4 (measured ENOSPC mid-warm-up twice); zstd cuts
      // shuffle bytes ~35-45% on this string-heavy table. Also the config
      // a real spill-bound cluster would run — both parallelism legs use
      // the same codec, so the 8-vs-32 comparison is internally consistent
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code = spark.read.parquet(input)
    // counted (footer-stats-only, cheap) and REPORTED so a stale pinned
    // input can't be silently profiled as if it had the assumed row count
    val codeRows = code.count()
    val dim = graft.gen.CodeTableGen.repoLangDim(spark)
    def deleteRecursively(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRecursively)
      f.delete(): Unit
    }
    def once(): Double = {
      val dir = java.nio.file.Files.createTempDirectory("prof")
      val io = new ParquetTableIO(dir.toString)
      val t0 = System.nanoTime()
      graft.suite.SuiteRunner.run(spark, code, dim, io)
      val t = (System.nanoTime() - t0) / 1e9
      // reclaim THIS run's audit output and prompt shuffle-file cleanup
      // BETWEEN timed runs (outside the timer): previous runs' shuffle
      // dependencies become unreachable here, and the per-run audit dirs
      // would otherwise stack up across the leg's 4 runs
      deleteRecursively(dir.toFile)
      System.gc()
      System.err.println(f"[prof] run ${t}%.1f s, disk free ${
        new java.io.File("/tmp").getUsableSpace / (1 << 30)}%d GiB")
      t
    }
    once() // warm-up (JIT of generated code)
    val ts = (1 to runs).map(_ => once()).sorted
    println(String.format(java.util.Locale.ROOT,
      """{"cpus":%s,"input":"%s","rows":%d,"runs":%d,"min":%.3f,"median":%.3f}""",
      cpus, input, Long.box(codeRows), Int.box(runs),
      Double.box(ts.head), Double.box(ts(ts.length / 2))))
    spark.stop()
  }
}

/** One-shot generator for the bench/scaling input table: writes the
  * deterministic code table at SPARK_GRAFT_SUITE_ROWS to the same layout
  * Bench uses (partitioned by batch_id), so scaling runs at several widths
  * share one on-disk input.
  */
object GenBenchInput {
  /** Ensures the bench code table exists with EXACTLY `rows` rows at the
    * SPARK_GRAFT_INPUT-pinned (or default per-row-count) path; (re)generates
    * otherwise. The single source of truth for bench/scaling input layout —
    * Bench and the scaling profiles both go through here, so a pinned path
    * holding a different row count is regenerated, never silently measured
    * (parquet count() is footer-stats-only, cheap).
    */
  def ensure(spark: SparkSession, rows: Long,
             pinned: Option[String] = sys.env.get("SPARK_GRAFT_INPUT")): String = {
    val out = pinned.getOrElse(s"/tmp/graft_bench_input_$rows")
    // readability probed through Spark's own FS layer (not java.nio, which
    // is blind to hdfs://-style URIs and to data whose _SUCCESS marker was
    // cleaned up): any readable parquet at the path yields its footer count
    val counted = scala.util.Try(spark.read.parquet(out).count()).getOrElse(-1L)
    if (counted != rows) {
      // a PINNED path holding ANY readable data of a different size is an
      // operator mistake (stale env var from a scaling session) —
      // overwriting would destroy an expensive input (256M rows ≈ 36 GB,
      // minutes to regenerate), so refuse; only an empty/unreadable pinned
      // path is generated into (that is GenBenchInput's contract), and the
      // default per-row-count path is always ours to regenerate
      if (pinned.isDefined && counted >= 0) throw new IllegalStateException(
        s"SPARK_GRAFT_INPUT=$out holds $counted rows but $rows were " +
          s"requested — unset SPARK_GRAFT_INPUT or set SPARK_GRAFT_SUITE_ROWS=$counted")
      gen.CodeTableGen.generate(spark, rows, batches = 4)
        .write.partitionBy("batch_id").mode("overwrite").parquet(out)
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SUITE_ROWS", "8000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = ensure(spark, rows)
    println(s"""{"input":"$out","rows":$rows}""")
    spark.stop()
  }
}
