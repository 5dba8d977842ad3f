package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Ivf

/** Measures IVF plan cost at production sizing — Catalyst analysis +
  * codegen + execution wall for the assignment and probe projections at
  * nlist ∈ {256, 1024} × dim 768 over a tiny corpus (so data cost is nil
  * and the timing isolates PLAN cost: literal size, analysis, codegen).
  * Round-4 verdict "What's wrong #1": the per-centroid `typedLit` lambda
  * shape carries ~786k double literals and 1024 aggregate lambdas at this
  * sizing; this probe stamps the before/after numbers for the O(1)-plan
  * rewrite (BENCH/BASELINE.md).
  */
object IvfPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ivf-plan-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 768
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 200).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble()))
    }.toDF("id", "embedding")
    corpus.persist().count()

    def timed(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$what%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    for (nlist <- Seq(256, 1024)) {
      val cents = Array.fill(nlist)(Array.fill(dim)(rnd.nextGaussian()))
      timed(s"assign  nlist=$nlist dim=$dim") {
        Ivf.assignLists(corpus, "id", "embedding", cents).count()
      }
      timed(s"search  nlist=$nlist dim=$dim nprobe=8") {
        Ivf.ivfTopKFromIndex(
          corpus.where(col("id") < 4), corpus,
          Ivf.assignLists(corpus, "id", "embedding", cents), cents,
          "id", "embedding", k = 5, nprobe = 8).count()
      }
    }
    spark.stop()
  }
}
