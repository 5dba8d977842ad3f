package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[mini] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val dir = "/root/testdata/sf0.1"
    time("q_minhash_pairs")(SparkEntry.queries("q_minhash_pairs")(spark, dir).write.mode("overwrite").format("noop").save())
    time("q_simhash_pairs")(SparkEntry.queries("q_simhash_pairs")(spark, dir).write.mode("overwrite").format("noop").save())
    time("q_ngram_jaccard")(SparkEntry.queries("q_ngram_jaccard")(spark, dir).write.mode("overwrite").format("noop").save())
    time("q_dedup_exact")(SparkEntry.queries("q_dedup_exact")(spark, dir).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
