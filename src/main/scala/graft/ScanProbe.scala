package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/tmp/graft_bench_input_8000000")
    def t(name: String)(f: => Any): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[scan] $name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    t("len-scan")(df.agg(sum(length(col("content")))).collect())
    t("sha-scan")(df.agg(sum(when(sha2(col("content"),256) =!= col("expected_sha256"), 1L).otherwise(0L))).collect())
    t("dup-shuffle")(df.groupBy(xxhash64(col("repo"),col("path"),col("commit")).as("kh")).count().where(col("count")>1).count())
    spark.stop()
  }
}
