package graft

import graft.stats.FreqSketch
import graft.suite.{Salting, SuiteConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies the G7 claim at bench scale: the level-1 shuffle volume of
  * the repo-keyed count under STATIC salting (every key splinters into up
  * to SaltBuckets partials) vs ADAPTIVE salting (only sketch-named hot
  * keys splinter; the long tail keeps one partial per key). Prints one
  * JSON line with both level-1 row volumes, the hot-set size and the
  * end-to-end wall of each path → BENCH/salt_probe_<cpus>.json.
  *
  * Uses the same 8M-row bench input as StageProbe (SPARK_GRAFT_INPUT).
  * At the generator's cardinality (~1.3k distinct repos) the static tail
  * multiplier is visible but modest; at the target 10^8-10^9 distinct
  * repos it IS the shuffle bill — the probe reports rows so the ratio can
  * be extrapolated linearly in the distinct-key count.
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val input = sys.env.getOrElse("SPARK_GRAFT_INPUT", "/tmp/graft_bench_input_8000000")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val code = spark.read.parquet(input)
      .withColumn("batch_id", col("batch_id").cast("bigint"))
    val saltSrc = Seq(col("path"), col("commit"))
    val grpKeys = Seq(col("batch_id"), col("repo"))

    // job-1 detect: the freq sketch the suite's artifacts pass already
    // carries; timed separately so its (shared, amortized) cost is visible
    val t0 = System.nanoTime()
    val bytes = code.agg(
      FreqSketch.freqItemsAgg(col("repo"), SuiteConfig.FreqMapSize))
      .collect()(0).getAs[Array[Byte]](0)
    val rows = code.count()
    val threshold = math.max(1L, rows / cpus.toInt)
    val hot = FreqSketch.hotKeys(bytes, threshold)
    val detectSec = (System.nanoTime() - t0) / 1e9

    def level1(salt: org.apache.spark.sql.Column): Long =
      code.groupBy(grpKeys :+ salt.as("_salt"): _*)
        .agg(count(lit(1)).as("p")).count()

    def counts(salt: org.apache.spark.sql.Column): Long =
      code.groupBy(grpKeys :+ salt.as("_salt"): _*)
        .agg(count(lit(1)).as("p"))
        .groupBy(grpKeys: _*).agg(sum("p")).count()

    val staticSalt = pmod(xxhash64(saltSrc: _*), lit(SuiteConfig.SaltBuckets))
    val adaptiveSalt = Salting.adaptiveSaltCol(
      col("repo"), hot, SuiteConfig.SaltBuckets, saltSrc)

    val staticRows = level1(staticSalt)
    val adaptiveRows = level1(adaptiveSalt)

    def minOf(f: => Any): Double = {
      f
      (1 to runs).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
      }.min
    }
    val staticSec = minOf(counts(staticSalt))
    val adaptiveSec = minOf(counts(adaptiveSalt))

    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json = s"""{"probe":"salt","cpus":$cpus,"rows":$rows,""" +
      s""""distinct_repos":${code.select("repo").distinct().count()},""" +
      s""""hot_keys":${hot.size},"threshold":$threshold,""" +
      s""""level1_rows_static":$staticRows,"level1_rows_adaptive":$adaptiveRows,""" +
      s""""detect_sec":${num(detectSec)},"static_sec":${num(staticSec)},""" +
      s""""adaptive_sec":${num(adaptiveSec)}}"""
    val outDir = java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."), "BENCH")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.writeString(outDir.resolve(s"salt_probe_$cpus.json"), json + "\n")
    spark.stop()
    println(json)
  }
}
