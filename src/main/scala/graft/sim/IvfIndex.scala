package graft.sim

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Committed on-disk IVF index — the persisted, partition-pruned form
  * promised by the [[Ivf.assignLists]] contract ("written once,
  * partitioned by list_id, reused across query batches"). Layout:
  *
  * {{{
  *   root/centroids/            (list_id, centroid) parquet
  *   root/assign/list_id=<n>/   (id) parquet, hive-partitioned
  *   root/_commit.json          commit marker {"version":1,"nlist":N,"dim":D}
  * }}}
  *
  * The marker is written LAST by atomic rename (the TableIO manifest
  * pattern): a torn write leaves no marker and the index reads as absent.
  * Reload is version-gated like the suite's baseline artifacts — an
  * unknown wire version reads as absent (never parsed by a newer reader);
  * the caller rebuilds, and the rebuild re-stamps the current version.
  *
  * Search prunes the assignment scan to the probed lists: probe selection
  * runs first and its DISTINCT list ids (bounded by `nlist` ≤ 1024
  * regardless of query count — a legitimate driver-side collect of
  * boundary-scale data) become a static `isin` partition filter, so only
  * the probed `list_id=` directories are ever read (asserted in PlanSpec).
  * At 100 TB this is the difference between scanning the whole index and
  * scanning ~nprobe/nlist of it per query batch.
  *
  * Degenerate corpus rows (null `list_id` from [[Ivf.assignLists]]) are
  * not indexed — they can never be probed, so storing them would only
  * create a dead default partition.
  */
object IvfIndex {
  val FormatVersion = 1

  private def assignDir(root: String) = s"$root/assign"
  private def centroidsDir(root: String) = s"$root/centroids"
  private def markerPath(root: String) = Paths.get(root, "_commit.json")

  /** Train + assign + commit in one call; returns the trained centroids. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
            idCol: String, vecCol: String, nlist: Int): Array[Array[Double]] = {
    val cents = Ivf.trainCentroids(corpus, idCol, vecCol, nlist)
    write(spark, root, cents, Ivf.assignLists(corpus, idCol, vecCol, cents))
    cents
  }

  /** Write both index halves, then atomically publish the commit marker. */
  def write(spark: SparkSession, root: String,
            centroids: Array[Array[Double]], assignments: DataFrame): Unit = {
    Ivf.centroidsDF(spark, centroids)
      .write.mode(SaveMode.Overwrite).parquet(centroidsDir(root))
    assignments.where(col("list_id").isNotNull)
      .write.partitionBy("list_id")
      .mode(SaveMode.Overwrite).parquet(assignDir(root))
    val dim = if (centroids.isEmpty) 0 else centroids(0).length
    val meta =
      s"""{"version":$FormatVersion,"nlist":${centroids.length},"dim":$dim}"""
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "._commit.json.tmp")
    Files.writeString(tmp, meta)
    Files.move(tmp, markerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append a new batch's assignments to the committed store (incremental
    * index maintenance: assignment is row-wise and centroid-pinned, so
    * assigning ONLY the delta and appending equals a full rebuild —
    * tested). Caller guarantees delta ids are new; the commit marker is
    * untouched (same centroids, same wire version).
    */
  def appendAssignments(root: String, delta: DataFrame): Unit =
    delta.where(col("list_id").isNotNull)
      .write.partitionBy("list_id")
      .mode(SaveMode.Append).parquet(assignDir(root))

  /** `(version, nlist, dim)` from the commit marker, if present. */
  def readMeta(root: String): Option[(Int, Int, Int)] = {
    val p = markerPath(root)
    if (!Files.isRegularFile(p)) return None
    val s = Files.readString(p)
    val m = """\{"version":(\d+),"nlist":(\d+),"dim":(\d+)\}""".r
    s.trim match {
      case m(v, n, d) => Some((v.toInt, n.toInt, d.toInt))
      case _ => None
    }
  }

  /** The committed centroids, ordered by `list_id` — None if the index is
    * absent, torn (no marker), or wire-versioned by a different writer.
    */
  def readCentroids(spark: SparkSession, root: String): Option[Array[Array[Double]]] =
    readMeta(root) match {
      case Some((v, _, _)) if v == FormatVersion =>
        Some(spark.read.parquet(centroidsDir(root))
          .orderBy("list_id").collect()
          .map(_.getSeq[Double](1).toArray))
      case _ => None
    }

  /** The committed assignment table `(id, list_id)` — list_id is the hive
    * partition column, so `isin` filters on it prune directories.
    */
  def readAssignments(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(assignDir(root)).select("id", "list_id")

  /** IVF top-k over the committed index. EAGER twice at call time (the
    * centroid reload and the bounded distinct-probed-lists job); the
    * returned search plan is lazy and scans ONLY the probed `list_id=`
    * directories. `probesOverride` lets the correctness gate pass in a
    * WRITTEN copy of the probe table so its oracle rides byte-identical
    * probes (FP near-ties in the top-nprobe cut cannot diverge).
    */
  def searchCommitted(spark: SparkSession, root: String,
                      queries: DataFrame, corpus: DataFrame,
                      idCol: String, vecCol: String,
                      k: Int = 10, nprobe: Int = 0,
                      probesOverride: DataFrame = null): DataFrame = {
    val cents = readCentroids(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed IVF index at $root (absent, torn, or wrong wire version " +
          s"${readMeta(root).map(_._1)} vs $FormatVersion) — rebuild with IvfIndex.build"))
    val np = if (nprobe > 0) math.min(nprobe, cents.length)
             else math.max(1, cents.length / 8)
    val probes =
      if (probesOverride != null) probesOverride
      else Ivf.probeTable(queries, cents, idCol, vecCol, np)
    val probedLists = probes.select("list_id").distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val assign = readAssignments(spark, root)
      .where(col("list_id").isin(probedLists: _*))
    Ivf.ivfTopKFromProbes(probes, queries, corpus, assign, idCol, vecCol, k)
  }
}
