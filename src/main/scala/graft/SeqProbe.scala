package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: replay a subset of Bench's query sequence with Bench's exact
  * session config + timing protocol to localize sequence-dependent cold
  * costs. Args: query names in order; each timed cold+warm like Bench.
  * Not part of the driver contract.
  */
object SeqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-seqprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        def once(): Double = {
          spark.catalog.clearCache()
          time(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
        }
        val cold = once(); val warm = once()
        println(f"[seq] $name cold $cold%.2f warm $warm%.2f")
      }
    }
    spark.stop()
  }
}
