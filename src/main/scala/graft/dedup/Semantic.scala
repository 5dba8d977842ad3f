package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.sim.{Ivf, IvfAssign}

/** Semantic (embedding-space) deduplication — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding space with
  * a k-means coarse quantizer, search for near-duplicate pairs only WITHIN
  * each cluster, take connected components, keep one representative per
  * component. Complements the sign-LSH pair pipeline (Dedup.embeddingPairs):
  * LSH is data-oblivious with analytic recall; the quantizer is
  * data-adaptive and makes the candidate volume Σ|cluster|² instead of
  * bucket-collision-driven — the published trade-off for semantic dedup of
  * web-scale training corpora.
  *
  * Scale shape:
  *   - Training is the bounded driver-side spherical k-means already used
  *     by IVF ([[Ivf.trainCentroids]]) — cost independent of corpus size.
  *   - Assignment is ONE codegen'd narrow pass ([[IvfAssign]], centroid
  *     matrix in the expression node — plan size O(1) in nlist).
  *   - The within-cluster self-join shuffles (list_id, id, v) once per
  *     side, keyed on list_id; with nlist ≈ √n clusters average n/nlist
  *     rows, and AQE's skew-join split handles oversized clusters. The
  *     quadratic-within-cluster scoring is the algorithm's documented
  *     cost model — nlist is the knob. Degenerate-quantizer regime
  *     (spec-pinned, SemanticSpec): a cluster holding fraction α of the
  *     corpus degrades gracefully to (αn)² candidate volume inside a
  *     skew-splittable list_id-keyed equi-join — never to a cartesian
  *     plan or wrong results; nlist ≈ √n is the sizing rule that bounds
  *     the EXPECTED cluster, and re-training (more iters / larger sample)
  *     is the remedy when one centroid captures a constant fraction.
  *   - Grouping rides [[Components.connectedComponents]] (log-round
  *     star contraction), so transitive near-dup chains collapse to one
  *     survivor exactly, not greedily.
  */
object Semantic {

  /** (id, v, list_id) in one codegen'd pass; degenerate vectors (null,
    * empty, zero-norm) get a null list_id and never pair.
    */
  def withClusters(vecs: DataFrame, idCol: String, vecCol: String,
                   centroids: Array[Array[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    vecs.select(col(idCol).as("id"), v.as("v"),
      ColumnBridge.column(IvfAssign(ColumnBridge.expression(v), centroids))
        .as("list_id"))
  }

  /** Within-cluster near-duplicate pairs: exact cosine ≥ `tau` over the
    * list_id-keyed self-join of `clustered` (output of [[withClusters]]).
    * Pairs are emitted once (id1 < id2).
    */
  def semanticPairs(clustered: DataFrame, tau: Double): DataFrame = {
    val base = clustered.where(col("list_id").isNotNull)
    val l = base.select(col("list_id"), col("id").as("id1"), col("v").as("v1"))
    val r = base.select(col("list_id"), col("id").as("id2"), col("v").as("v2"))
    l.join(r, Seq("list_id"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), Dedup.cosine(col("v1"), col("v2")).as("cosine"))
      .where(col("cosine") >= tau)
  }

  /** Grouping over a PRECOMPUTED clustered table (the D8 pipeline-half
    * pattern — also what the correctness oracle's dump rides): within-
    * cluster pairs → connected components → per-row labels
    * (id, list_id, rep); rep == id for survivors and unpaired rows.
    */
  def semanticGroupsFromClusters(clustered: DataFrame, tau: Double): DataFrame = {
    val cc = Components.connectedComponents(semanticPairs(clustered, tau))
      .withColumnRenamed("rep", "__ccrep")
    clustered.select(col("id"), col("list_id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"), col("list_id"),
        coalesce(col("__ccrep"), col("id").cast("long")).as("rep"))
  }

  /** Full pipeline: train → assign → within-cluster pairs → connected
    * components. Returns one row per input vector:
    * (id, list_id, rep) where rep is the min id of the vector's semantic
    * near-dup component (rep == id for survivors). The result is persisted
    * and materialized; callers unpersist when done (the Dedup contract).
    */
  def semanticGroups(vecs: DataFrame, idCol: String, vecCol: String,
                     tau: Double, nlist: Int, iters: Int = 5,
                     sampleN: Int = 0): DataFrame = {
    val cents = Ivf.trainCentroids(vecs, idCol, vecCol, nlist, iters, sampleN)
    val clustered = withClusters(vecs, idCol, vecCol, cents).persist()
    try {
      val out = semanticGroupsFromClusters(clustered, tau).persist()
      out.count()
      out
    } finally clustered.unpersist(blocking = false)
  }

  /** Keep one row per semantic component (the min-id survivor) plus every
    * unclustered/unpaired row.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    tau: Double, nlist: Int): DataFrame = {
    val groups = semanticGroups(df, idCol, vecCol, tau, nlist)
    try df.join(
        groups.where(col("rep") === col("id"))
          .select(col("id").as(idCol)),
        Seq(idCol), "left_semi")
      .localCheckpoint() // decouple from `groups` before the unpersist
    finally groups.unpersist(blocking = false)
  }
}
