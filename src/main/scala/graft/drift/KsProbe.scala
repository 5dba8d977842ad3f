package graft.drift
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage decomposition of q_ks_statistic / q_drift_stats at
  * sf0.1. Not part of the driver contract.
  */
object KsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ks] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val isBase = col("l_shipdate") < lit("1998-01-01").cast("timestamp")
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val counts = time("counts build+persist+count") {
        val c = KsTest.distinctCounts(li,
          Seq("l_extendedprice", "l_quantity"), isBase).persist()
        val n = c.count(); println(s"    distinct rows: $n"); c
      }
      val qs = (1 until 32).map(_.toDouble / 32)
      time("boundary percentiles") {
        counts.groupBy("cid")
          .agg(percentile_approx(col("v"), typedlit(qs), lit(1000)).as("bs"))
          .collect()
      }
      time("max-gap final job") {
        KsTest.ksMaxGapFromCounts(counts, 32).collect()
      }
      // sub-decomposition of the max-gap job
      locally {
        val boundRows = counts.groupBy("cid")
          .agg(percentile_approx(col("v"), typedlit(qs), lit(1000)).as("bs"))
          .collect()
        val bounds = boundRows.map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toSeq
        val bucketFor = bounds.foldLeft(lit(0)) { case (els, (cid, bs)) =>
          val cnt = bs.distinct.sorted.foldLeft(lit(0))((acc, b) =>
            acc + when(col("v") > b, 1).otherwise(0))
          when(col("cid") === cid, cnt).otherwise(els)
        }
        val withB = counts.withColumn("bucket", bucketFor)
        time("  withB projection alone (noop)") {
          withB.write.mode("overwrite").format("noop").save()
        }
        val wOff = org.apache.spark.sql.expressions.Window.partitionBy("cid").orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy("cid")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val offsetsDf = withB.groupBy("cid", "bucket")
          .agg(sum("c1").as("t1"), sum("c2").as("t2"))
          .select(col("cid"), col("bucket"),
            (sum("t1").over(wOff) - col("t1")).as("off1"),
            (sum("t2").over(wOff) - col("t2")).as("off2"),
            sum("t1").over(wAll).as("n1"),
            sum("t2").over(wAll).as("n2"))
        time("  offsets job alone (collect)") { offsetsDf.collect() }
        val w = org.apache.spark.sql.expressions.Window.partitionBy("cid", "bucket").orderBy("v")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        time("  main window+join+max (collect)") {
          withB.join(broadcast(offsetsDf), Seq("cid", "bucket"))
            .withColumn("cum1", (sum("c1").over(w) + col("off1")).cast("double"))
            .withColumn("cum2", (sum("c2").over(w) + col("off2")).cast("double"))
            .groupBy("cid")
            .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("num"),
              max("n1").as("n1"), max("n2").as("n2")).collect()
        }
        time("  windows only, no offsets join (collect)") {
          withB
            .withColumn("cum1", sum("c1").over(w))
            .withColumn("cum2", sum("c2").over(w))
            .groupBy("cid")
            .agg(max(abs(col("cum1"))).as("num")).collect()
        }
      }
      time("full ks2SampMulti") {
        KsTest.ks2SampMulti(li, Seq("l_extendedprice", "l_quantity"), isBase)
      }
      time("full q_drift_stats fn") {
        SparkEntry.queries("q_drift_stats")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
