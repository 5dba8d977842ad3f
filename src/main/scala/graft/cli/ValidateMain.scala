package graft.cli

import graft.gen.CodeTableGen
import graft.suite.SuiteRunner
import graft.tableio.ParquetTableIO
import org.apache.spark.sql.SparkSession

/** spark-submit entry point: validate a code table (generated
  * deterministically, or read from a parquet path) against the full
  * constraint + drift suite, writing verdicts/violations/lineage to the
  * audit directory. Re-running resumes from the last committed batch.
  *
  * Usage:
  *   ValidateMain <auditDir> [--rows N] [--batches B] [--input <parquetPath>]
  *                [--baseline B]   (re-point the reference batch — T8)
  */
object ValidateMain {
  def main(args: Array[String]): Unit = {
    // CLI table output uses f"" interpolation — pin the locale so decimal
    // separators are dots regardless of the host JVM locale
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val auditDir = args.headOption.getOrElse(sys.error("usage: ValidateMain <auditDir> [--rows N] [--batches B] [--input path]"))
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val rows = opt("--rows").map(_.toLong).getOrElse(100000L)
    val batches = opt("--batches").map(_.toInt).getOrElse(4)
    val baseline = opt("--baseline").map(_.toLong).getOrElse(0L) // T8: re-point the reference

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-validate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val code = opt("--input") match {
      case Some(path) => spark.read.parquet(path)
      case None       => CodeTableGen.generate(spark, rows, batches)
    }
    val dim = CodeTableGen.repoLangDim(spark)
    val io = new ParquetTableIO(auditDir)

    val t0 = System.nanoTime()
    val verdicts = SuiteRunner.run(spark, code, dim, io, baselineBatch = baseline)
    val secs = (System.nanoTime() - t0) / 1e9

    if (verdicts.isEmpty) {
      println(s"[graft] nothing pending — all batches already committed at $auditDir")
    } else {
      println(f"[graft] validated ${verdicts.map(_.batch_id).distinct.size} batch(es) in $secs%.1f s")
      println(f"${"batch"}%5s  ${"check"}%-18s ${"column"}%-18s ${"metric"}%12s ${"p"}%10s  pass")
      verdicts.sortBy(v => (v.batch_id, v.check, v.column)).foreach { v =>
        val p = if (v.p_value.isNaN) "-" else f"${v.p_value}%.4g"
        println(f"${v.batch_id}%5d  ${v.check}%-18s ${v.column}%-18s ${v.metric}%12.4f $p%10s  ${if (v.passed) "PASS" else "FAIL"}")
      }
      val failed = verdicts.filterNot(_.passed)
      println(s"[graft] ${verdicts.size} checks, ${failed.size} failed; audit at $auditDir")
      // threshold alert rules over this run's verdicts (DESIGN.md:689-747)
      import spark.implicits._
      val alerts = graft.suite.Alerts.evaluate(verdicts.toDF()).collect()
      alerts.foreach { a =>
        println(s"[graft][ALERT][${a.getAs[String]("severity")}] batch=${a.getAs[Long]("batch_id")} " +
          s"${a.getAs[String]("check")}(${a.getAs[String]("column")}): ${a.getAs[String]("message")}")
      }
    }
    spark.stop()
    if (verdicts.exists(v => !v.passed)) sys.exit(2)
  }
}
