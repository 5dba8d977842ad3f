package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes plans/r06/components_round_{before,after}.txt: the
  * `.explain("formatted")` of ONE fused large-star/small-star round in the
  * round-5 shape (groupBy+join double exchange, trailing distinct on both
  * stars — reproduced inline below, byte-faithful to the old code) and the
  * current solver shape, over the same checkpointed edge set — the plan
  * evidence for the round-6 Components claims (exchange count per round,
  * shared repartition exchange, dropped large-star distinct). Not part of
  * the driver contract.
  */
object CcPlanDump {
  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    // at real scale mins (≈|V| rows) is never broadcastable; disable the
    // small-input broadcast so the dumped plans show the shuffle-join
    // structure the at-scale claims are about
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val base = spark.range(0, 100000).select(
        pmod(xxhash64(col("id"), lit(1)), lit(100000)).as("u0"),
        pmod(xxhash64(col("id"), lit(2)), lit(100000)).as("v0"))
      .select(greatest(col("u0"), col("v0")).as("u"), least(col("u0"), col("v0")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    // round-5 forms, inline (the shapes the optimization replaced)
    def lsOld(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }
    def ssOld(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      e.join(mins, "u").select(col("v").as("n"), col("m"))
        .unionAll(mins.select(col("u").as("n"), col("m")))
        .where(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
        .distinct()
    }

    val outDir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.writeString(outDir.resolve("components_round_before.txt"),
      "==== one fused large-star/small-star round, round-5 shape ====\n" +
        fmt(ssOld(lsOld(base))))
    java.nio.file.Files.writeString(outDir.resolve("components_round_after.txt"),
      "==== one fused large-star/small-star round, current solver ====\n" +
        fmt(Components.smallStar(Components.largeStar(base))))
    System.err.println("[plans] components_round_{before,after}.txt written")
    spark.stop()
  }
}
