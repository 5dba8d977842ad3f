package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-stage suite decomposition at one parallelism level — run at
  * SPARK_GRAFT_CPUS=8 and =32 on the same input to attribute the N→4N
  * scaling gap stage by stage (BENCH/BASELINE.md). Each stage is timed
  * min-of-RUNS after a warm-up; one JSON line lands on stdout and in
  * BENCH/stage_probe_<cpus>.json.
  */
/** CPU-pure kernel (sha256 over synthesized strings, zero storage IO and
  * minimal memory traffic): isolates scheduler + CPU scaling from the
  * single-socket memory-bandwidth ceiling that bounds the real scans.
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def kernel(): Unit = spark.range(0, 128000000, 1, cpus.toInt * 4)
      .select(sha2(concat_ws("-", col("id"), lit("graft")), 256).as("h"))
      .agg(count(when(col("h").startsWith("00"), 1))).collect()
    kernel() // warm-up
    val secs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); kernel(); (System.nanoTime() - t0) / 1e9
    }.min
    println(String.format(java.util.Locale.ROOT,
      """{"cpus":%s,"cpu_kernel_sec":%.3f}""", cpus, Double.box(secs)))
    spark.stop()
  }
}

object StageProbe {
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
    val batches = Seq(0L, 1L, 2L, 3L)
    val dim = gen.CodeTableGen.repoLangDim(spark)

    def minOf(f: => Any): Double = {
      f // warm-up (JIT of generated code)
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // stage 1+2: artifacts (one content pass: stats + sha + sketches + counts)
    stages("artifacts") = minOf(suite.SuiteRunner.collectArtifacts(code, batches))

    // uniqueness two-phase (64-bit key shuffle + semi-join re-verify)
    val keyHash = xxhash64(col("repo"), col("path"), col("commit"))
    stages("uniqueness") = minOf {
      val cand = code.groupBy(col("batch_id"), keyHash.as("kh"))
        .agg(count(lit(1)).as("c")).where(col("c") > 1).select("batch_id", "kh")
      code.join(broadcast(cand),
          code("batch_id") === cand("batch_id") && keyHash === col("kh"), "left_semi")
        .groupBy("batch_id", "repo", "path", "commit")
        .agg(count(lit(1)).as("dup_count")).where(col("dup_count") > 1)
        .groupBy("batch_id").agg(sum(col("dup_count") - 1)).collect()
    }

    // referential anti-join vs broadcast dim
    stages("referential") = minOf {
      code.select("batch_id", "repo", "lang")
        .join(broadcast(dim.select("repo", "lang").distinct()), Seq("repo", "lang"), "left_anti")
        .groupBy("batch_id").agg(count(lit(1))).collect()
    }

    // salted per-repo counts (skew telemetry)
    stages("repo_metrics") = minOf {
      code.groupBy(col("batch_id"), col("repo"),
          pmod(xxhash64(col("path"), col("commit")), lit(16)).as("_s"))
        .agg(count(lit(1)).as("p"))
        .groupBy(col("batch_id"), col("repo")).agg(sum("p").as("file_count"))
        .groupBy(col("batch_id"))
        .agg(graft.stats.TopK.topKStrings(col("file_count"), col("repo"), 100).as("t"))
        .select(col("batch_id"), explode(col("t"))).collect()
    }

    // full run (includes the stages above + violation/verdict/lineage writes
    // + commits); residual = write/commit cost
    stages("full_run") = minOf {
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe").toString
      suite.SuiteRunner.run(spark, code, dim, new tableio.ParquetTableIO(tmp))
    }
    stages("residual_writes") = math.max(0.0,
      stages("full_run") - stages("artifacts") - stages("uniqueness") -
        stages("referential") - stages("repo_metrics"))

    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json = stages.map { case (k, v) => s""""$k":${num(v)}""" }
      .mkString(s"""{"cpus":$cpus,"input":"$input","runs":$runs,""", ",", "}")
    val outDir = java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."), "BENCH")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.writeString(outDir.resolve(s"stage_probe_$cpus.json"), json + "\n")
    spark.stop()
    println(json)
  }
}
