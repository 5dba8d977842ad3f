package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev probe: stage-by-stage wall decomposition of q_minhash_pairs.
  * Not part of the driver contract.
  */
object MinhashProbe {
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
      println(f"[mh] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = core.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val dups = docs.where(col("doc_id") < 50).select(
      (col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "\\s+\\S+$", "").as("text"))
    val corpus = docs.unionByName(dups)
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val shingled = time("shingle rows count")(
        corpus.select(col("doc_id"), explode(Dedup.shingleHashes(col("text"), 3)).as("sh")).count())
      println(s"    shingle rows: $shingled")
      val sigs = time("signatures persist+count") {
        val s = Dedup.minhashSignatures(corpus, "doc_id", "text", 64, 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        s.count(); s
      }
      val buckets = time("bucket table count")(
        sigs.select(col("id"), posexplode(Dedup.lshBandKeys(col("sig"), 16, 64)).as(Seq("band", "bkey"))).count())
      println(s"    bucket rows: $buckets")
      val cand = time("candidate pairs count") {
        val b = sigs.select(col("id"),
          posexplode(Dedup.lshBandKeys(col("sig"), 16, 64)).as(Seq("band", "bkey")))
        val l = b.select(col("band"), col("bkey"), col("id").as("id1"))
        val r = b.select(col("band"), col("bkey"), col("id").as("id2"))
        val c = l.join(r, Seq("band", "bkey")).where(col("id1") < col("id2"))
          .select("id1", "id2").dropDuplicates("id1", "id2").persist()
        val n = c.count(); println(s"    cand rows: $n"); c
      }
      time("tail (reattach+agree+filter)") {
        cand.join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), Seq("id1"))
          .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), Seq("id2"))
          .withColumn("est_jaccard",
            aggregate(zip_with(col("sig1"), col("sig2"),
              (a, b) => when(a === b, 1).otherwise(0)), lit(0),
              (acc, x) => acc + x).cast("double") / 64)
          .where(col("est_jaccard") >= 0.5)
          .select("id1", "id2", "est_jaccard").count()
      }
      time("full minhashLshPairsFromSigs")(
        Dedup.minhashLshPairsFromSigs(sigs, threshold = 0.5).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
