package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tableio.ParquetTableIO
object ProfileSuite {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code = spark.read.parquet("/tmp/graft_bench_input_8000000")
    val dim = graft.gen.CodeTableGen.repoLangDim(spark)
    (1 to 3).foreach { i =>
      val io = new ParquetTableIO(java.nio.file.Files.createTempDirectory(s"prof$i").toString)
      val t0 = System.nanoTime()
      graft.suite.SuiteRunner.run(spark, code, dim, io)
      println(f"[prof] run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
