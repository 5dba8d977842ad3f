package graft

import graft.sim.{Ann, Ivf}
import org.apache.spark.sql.functions._

class IvfSpec extends GraftSpec {
  import spark.implicits._

  /** Same clustered generator as AnnSpec: nClusters gaussian centroids,
    * members = centroid + small deterministic perturbation, id % nClusters
    * encodes the true cluster.
    */
  private def clustered(n: Int, dim: Int, nClusters: Int) = {
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centroids(i % nClusters)
      val noise = new scala.util.Random(1000 + i)
      (i.toLong, c.map(x => x + 0.05f * noise.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("trainCentroids is deterministic and returns unit-norm centroids") {
    val e = clustered(300, 16, 8)
    val a = Ivf.trainCentroids(e, "vec_id", "embedding", nlist = 8)
    val b = Ivf.trainCentroids(e, "vec_id", "embedding", nlist = 8)
    assert(a.length == 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"non-unit centroid norm $norm")
    }
  }

  test("assignLists puts every id in exactly one list, lists cover the corpus") {
    val e = clustered(400, 16, 8)
    val cents = Ivf.trainCentroids(e, "vec_id", "embedding", nlist = 8)
    val assign = Ivf.assignLists(e, "vec_id", "embedding", cents).collect()
    assert(assign.length == 400)
    assert(assign.map(_.getAs[Long]("id")).distinct.length == 400)
    assert(assign.forall { r =>
      val l = r.getAs[Int]("list_id"); l >= 0 && l < 8
    })
    // on well-separated clusters, cluster-mates land in the same list
    val byList = assign.groupBy(_.getAs[Int]("list_id"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("id") % 8).distinct.length }
    assert(byList.forall(_ == 1), "a trained list mixes true clusters")
  }

  test("nprobe = nlist probes everything: IVF result equals brute force exactly") {
    val e = clustered(250, 16, 5)
    val q = e.where(col("vec_id") < 8)
    val ivf = Ivf.ivfTopK(q, e, "vec_id", "embedding", k = 5,
        nlist = 8, nprobe = 8, corpusCount = 250)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val bf = Ann.bruteForceTopK(q, e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")),
        "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(ivf.toSeq == bf.toSeq)
  }

  test("clustered recall: small nprobe retrieves the brute-force neighbors") {
    val e = clustered(1000, 16, 8)
    val q = e.where(col("vec_id") < 20)
    val truth = Ann.bruteForceTopK(q, e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")),
        "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe=1 of 8 lists: on cleanly clustered data the single best list
    // holds the whole true neighborhood
    val got = Ivf.ivfTopK(q, e, "vec_id", "embedding", k = 10,
        nlist = 8, nprobe = 1, corpusCount = 1000)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("index-reuse form matches the one-call form; empty lists are harmless") {
    val e = clustered(200, 8, 4)
    val q = e.where(col("vec_id") < 5)
    // nlist far above the cluster count leaves some lists empty
    val cents = Ivf.trainCentroids(e, "vec_id", "embedding", nlist = 16)
    val assign = Ivf.assignLists(e, "vec_id", "embedding", cents)
    val a = Ivf.ivfTopKFromIndex(q, e, assign, cents, "vec_id", "embedding",
        k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    val b = Ivf.ivfTopK(q, e, "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 4, corpusCount = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("incremental index maintenance: assigning only the delta matches a full rebuild") {
    val e = clustered(300, 16, 8)
    val base = e.where(col("vec_id") < 200)
    val delta = e.where(col("vec_id") >= 200)
    val cents = Ivf.trainCentroids(base, "vec_id", "embedding", nlist = 8)
    val full = Ivf.assignLists(e, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val incremental = Ivf.assignLists(base, "vec_id", "embedding", cents)
      .unionByName(Ivf.assignLists(delta, "vec_id", "embedding", cents))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(incremental.toSeq == full.toSeq)
    // and a search over the incrementally-maintained index matches one over
    // the rebuilt index
    val q = e.where(col("vec_id") < 5)
    val incIdx = Ivf.assignLists(base, "vec_id", "embedding", cents)
      .unionByName(Ivf.assignLists(delta, "vec_id", "embedding", cents))
    val a = Ivf.ivfTopKFromIndex(q, e, incIdx, cents, "vec_id", "embedding",
        k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    val b = Ivf.ivfTopKFromIndex(q, e,
        Ivf.assignLists(e, "vec_id", "embedding", cents), cents,
        "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("autoNlist: power-of-two near sqrt(n), clamped") {
    assert(Ivf.autoNlist(0) == 4)
    assert(Ivf.autoNlist(100) == 16)
    assert(Ivf.autoNlist(1000000) == 1024)
    assert(Ivf.autoNlist(Long.MaxValue) == 1024)
  }
}
