package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.{Ivf, Pq}

/** Paired-parallelism scaling probe for the ANN family (the north rule's
  * two-cluster-size criterion applied to the round-5 components): times
  * the three distributed passes — IVF assignment (nlist=1024 codegen'd
  * kernel), PQ encode (m=8 × ks=256), and the ADC search scan (256
  * queries × corpus codes, salted top-100) — over a generated on-disk
  * corpus of `SPARK_GRAFT_ANN_ROWS` (default 8M) × dim 64 vectors, at
  * `SPARK_GRAFT_CPUS` threads. Driver-side training (bounded sample) is
  * excluded: it is a fixed cost independent of corpus size by
  * construction. Run at 8 and 32 cpus on the same input and compare
  * (BENCH/run_ann_scaling_r5.sh).
  *
  * The input is deterministic (xxhash64-derived uniform floats), written
  * once and reused across parallelism levels.
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_ANN_ROWS", "8000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val dim = 64
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-ann-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val input = s"/tmp/graft_ann_input_$rows"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(input, "_done"))) {
      spark.range(rows).select(col("id"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => (pmod(xxhash64(col("id") * dim + j), lit(1000000L)) / 1000000.0 - 0.5)
              .cast("float")).as("embedding"))
        .repartition(64)
        .write.mode("overwrite").parquet(input)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(input, "_done"))
    }
    val e = spark.read.parquet(input)

    // training excluded from timings (driver-side, corpus-size-independent)
    val cents = Ivf.trainCentroids(e, "id", "embedding", nlist = 1024)
    val cb = Pq.trainCodebooks(e, "id", "embedding", m = 8, ks = 256)
    val queries = e.where(col("id") < 256)

    def timeMin(f: => Unit): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up (JIT for the codegen'd kernels), excluded
    noop(Ivf.assignLists(e.limit(200000), "id", "embedding", cents))
    noop(Pq.encode(e.limit(200000), "id", "embedding", cb))

    val assignSec = timeMin(noop(Ivf.assignLists(e, "id", "embedding", cents)))
    val encodeSec = timeMin(noop(Pq.encode(e, "id", "embedding", cb)))
    val codes = Pq.encode(e, "id", "embedding", cb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count()
    val adcSec = timeMin(noop(
      Pq.adcCandidates(queries, codes, cb, "id", "embedding", rerank = 100)))
    codes.unpersist(blocking = false)

    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"probe":"ann_scale","cpus":$cpus,"rows":$rows,"runs":$runs,""" +
      s""""assign_sec":${num(assignSec)},"encode_sec":${num(encodeSec)},""" +
      s""""adc_sec":${num(adcSec)}}""")
    spark.stop()
  }
}
