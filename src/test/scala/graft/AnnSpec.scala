package graft

import graft.sim.Ann
import org.apache.spark.sql.functions._

class AnnSpec extends GraftSpec {
  import spark.implicits._

  /** Clustered synthetic embeddings: `nClusters` orthogonal-ish centroids,
    * members = centroid + small deterministic perturbation. id encodes the
    * cluster (id % nClusters).
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

  test("brute-force top-k: nearest neighbors are same-cluster, ranked by cosine") {
    val e = clustered(200, 16, 10)
    val out = Ann.bruteForceTopK(e.where(col("vec_id") < 5), e, "vec_id", "embedding", k = 5)
      .collect()
    assert(out.length == 25)
    // every neighbor of query q is in q's cluster (clusters are far apart)
    out.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 10 == r.getAs[Long]("query_id") % 10,
        s"bad neighbor: $r")
      assert(r.getAs[Double]("cosine") > 0.9)
    }
    // ranks are 1..5 per query, cosine non-increasing
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val cs = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    val e = clustered(500, 16, 10)
    val q = e.where(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.lshTopK(q, e, "vec_id", "embedding", k = 5, bits = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low")
  }

  test("multi-table banding: recall ≥ 0.9 at 2^16 buckets per table (bits=16, tables=8)") {
    val e = clustered(500, 16, 10)
    val q = e.where(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.lshTopK(q, e, "vec_id", "embedding", k = 5, bits = 16, tables = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"multi-table LSH recall $recall too low")
  }

  test("fully-default lshTopK (joint auto bits+tables) keeps recall on clustered data") {
    // exercises the (bits=0, tables=0) path end-to-end: corpus count →
    // autoBitsTables(n, designCos=0.9, 1-bit probe) — for n=500 that is
    // bits=8 (floor), 3 tables — and the derived index must still find the
    // same-cluster neighbors brute force finds
    val e = clustered(500, 16, 10)
    val q = e.where(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.lshTopK(q, e, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"default-path LSH recall $recall too low")
    // a caller-supplied corpusCount must yield the IDENTICAL index config
    // (it only replaces the sizing count job, not the derivation)
    val counted = Ann.lshTopK(q, e, "vec_id", "embedding", k = 5, corpusCount = 500L)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(counted == approx, "corpusCount path must match the counted path")
  }

  test("more tables monotonically add candidate coverage (banding tradeoff)") {
    val e = clustered(300, 16, 10)
    val q = e.where(col("vec_id") < 10)
    def pairs(tables: Int): Set[(Long, Long)] =
      Ann.lshTopK(q, e, "vec_id", "embedding", k = 10, bits = 16, tables = tables)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val one = pairs(1); val four = pairs(4)
    assert(four.size >= one.size, s"tables=4 found ${four.size} < tables=1 ${one.size}")
  }

  test("rankCut parity: aggregate cut == row_number window cut, incl. cosine ties") {
    import org.apache.spark.sql.expressions.Window
    // 40 base vectors plus EXACT duplicates of 10 of them: duplicate
    // corpus vectors give identical cosines against every query, so the
    // (cosine desc, neighbor_id asc) id tie-break is load-bearing
    val base = clustered(40, 8, 4)
    val dups = base.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val e = base.union(dups)
    val q = e.where(col("vec_id") < 6)
    val agg = Ann.bruteForceTopK(q, e, "vec_id", "embedding", k = 7)
    // independent window-cut reference over the same scored set
    val qv = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cv = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val win = cv.crossJoin(qv)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", graft.dedup.Dedup.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 7)
      .select("query_id", "neighbor_id", "cosine", "rank")
    val a = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val b = win.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == b, s"agg-vs-window cut diverged: only-agg=${a -- b} only-window=${b -- a}")
    assert(a.nonEmpty)
  }

  test("rankCut: NULL-cosine rows (null embeddings) never fill rank slots") {
    // 4-row corpus with k=5: a row_number window (desc = nulls last) would
    // let the NULL-cosine row trail in as rank 4; the cut drops it — a
    // null score is not a neighbor. Zero vectors score 0.0 (the pinned
    // Dedup.cosine convention) and legitimately rank last.
    val e = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f)),
      (3L, Array(0f, 0f, 0f, 0f)),
      (4L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(e.where(col("vec_id") === 0), e,
      "vec_id", "embedding", k = 5).collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 2L, 3L))
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("cosine"))))
  }
}
