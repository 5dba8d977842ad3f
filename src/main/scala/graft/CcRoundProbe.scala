package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: per-phase decomposition of ONE large-star/small-star round at
  * scale — attributes the components solve's per-round cost (checkpoint,
  * joins, distincts, signature) before touching the solver. Not part of the
  * driver contract.
  */
object CcRoundProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nEdges = sys.env.getOrElse("SPARK_GRAFT_CC_EDGES", "10000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val hub = nEdges / 10
    val canonical = spark.range(0, nEdges - hub).select(
        pmod(xxhash64(col("id"), lit(1)), lit(nEdges)).as("u0"),
        pmod(xxhash64(col("id"), lit(2)), lit(nEdges)).as("v0"))
      .unionAll(spark.range(0, hub).select(
        lit(0L).as("u0"), (col("id") + nEdges).as("v0")))
      .select(greatest(col("u0"), col("v0")).as("u"), least(col("u0"), col("v0")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    val base = time("base checkpoint (gen+distinct)")(canonical.localCheckpoint())

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      e.join(mins, "u")
        .select(col("v").as("n"), col("m"))
        .unionAll(mins.select(col("u").as("n"), col("m")))
        .where(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
        .distinct()
    }

    (1 to 2).foreach { round =>
      println(s"--- decomposition round $round ---")
      // phase A: large-star alone, materialized
      val ls = time("largeStar checkpoint")(largeStar(base).localCheckpoint())
      println(s"    ls rows: ${time("ls count")(ls.count())}")
      // large-star WITHOUT its trailing distinct
      val lsNoD = time("largeStar-no-distinct checkpoint") {
        val sym = base.select(col("u"), col("v"))
          .unionAll(base.select(col("v").as("u"), col("u").as("v")))
        val mins = sym.groupBy("u").agg(min("v").as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m"))
        sym.join(mins, "u")
          .where(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .where(col("u") =!= col("v"))
          .localCheckpoint()
      }
      println(s"    lsNoD rows: ${lsNoD.count()}")
      // phase B: small-star over the large-star output
      val ss = time("smallStar checkpoint")(smallStar(ls).localCheckpoint())
      println(s"    ss rows: ${ss.count()}")
      // fused round exactly as the solver runs it
      val fused = time("fused round checkpoint")(smallStar(largeStar(base)).localCheckpoint())
      // signature job
      time("signature") {
        fused.select(xxhash64(col("u"), col("v")).as("h"))
          .agg(count(lit(1)), coalesce(expr("bit_xor(h)"), lit(0L))).collect()
      }
      // shuffled-hash-join variant of the fused round
      time("fused round SHJ conf") {
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        try smallStar(largeStar(base)).localCheckpoint()
        finally spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
      }
      Seq(ls, lsNoD, ss).foreach(_.unpersist())
    }
    println("--- executed plan of one largeStar (joins/exchanges) ---")
    largeStar(base).explain("formatted")
    spark.stop()
  }
}
