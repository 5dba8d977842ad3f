package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: interleaved A/B of one fused large-star/small-star round in
  * three shapes — (A) groupBy+join, trailing distinct on both stars (the
  * round-5 form), (B) shared repartition exchange, both distincts, (C)
  * shared repartition, no large-star distinct (the round-6 form). The
  * variants alternate within one session so ambient load hits all three;
  * report min and median of N. Not part of the driver contract.
  */
object CcAbProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nEdges = sys.env.getOrElse("SPARK_GRAFT_CC_EDGES", "10000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val hub = nEdges / 10
    val base = spark.range(0, nEdges - hub).select(
        pmod(xxhash64(col("id"), lit(1)), lit(nEdges)).as("u0"),
        pmod(xxhash64(col("id"), lit(2)), lit(nEdges)).as("v0"))
      .unionAll(spark.range(0, hub).select(
        lit(0L).as("u0"), (col("id") + nEdges).as("v0")))
      .select(greatest(col("u0"), col("v0")).as("u"), least(col("u0"), col("v0")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    def lsOld(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }
    def lsRep(e: DataFrame, dedup: Boolean): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val out = sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
      if (dedup) out.distinct() else out
    }
    def ssOld(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      e.join(mins, "u").select(col("v").as("n"), col("m"))
        .unionAll(mins.select(col("u").as("n"), col("m")))
        .where(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
        .distinct()
    }
    def ssRep(e: DataFrame): DataFrame = {
      val eP = e.repartition(col("u"))
      val mins = eP.groupBy("u").agg(min("v").as("m"))
      eP.join(mins, "u").select(col("v").as("n"), col("m"))
        .unionAll(mins.select(col("u").as("n"), col("m")))
        .where(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
        .distinct()
    }

    val variants = Seq(
      "A_old" -> (() => { ssOld(lsOld(base)).localCheckpoint().unpersist(); () }),
      "B_rep" -> (() => { ssRep(lsRep(base, dedup = true)).localCheckpoint().unpersist(); () }),
      "C_rep_nodist" -> (() => { ssRep(lsRep(base, dedup = false)).localCheckpoint().unpersist(); () }))
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // one untimed warm-up each, then interleaved timed reps
    variants.foreach { case (_, f) => f() }
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        samples(name) = samples(name) :+ time { f() }
      }
    }
    samples.toSeq.sortBy(_._1).foreach { case (name, xs) =>
      val s = xs.sorted
      println(f"[ab] $name%-14s min ${s.head}%.2f s  median ${s(s.size / 2)}%.2f s  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
