package graft

import graft.dedup.{Components, Dedup, Semantic}
import org.apache.spark.sql.functions._

/** Semantic dedup laws: single-cluster mode equals brute-force pairs + CC
  * (the quantizer only PRUNES the pair search), well-separated clusters
  * group their injected near-dups, transitive chains collapse to one
  * survivor, and degenerate vectors never pair.
  */
class SemanticSpec extends GraftSpec {
  import spark.implicits._

  /** Well-separated synthetic corpus: `k` axis-aligned modes in dim `d`,
    * `per` points each = mode axis + small seeded noise; ids are
    * mode*1000+i.
    */
  private def modes(k: Int, per: Int, d: Int = 16, noise: Double = 0.05,
                    seed: Int = 7): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    for (m <- 0 until k; i <- 0 until per) yield {
      val v = Array.tabulate(d)(j =>
        (if (j == m) 1.0 else 0.0) + noise * rnd.nextGaussian())
      ((m * 1000 + i).toLong, v.toSeq)
    }
  }

  test("nlist=1 equals brute-force pairs + connected components") {
    val data = modes(3, 12).toDF("id", "v")
    val got = Semantic.semanticGroups(data, "id", "v", tau = 0.97, nlist = 1)
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.unpersist()
    // brute force: all pairs cosine >= tau, then the same CC operator
    val l = data.select(col("id").as("id1"), col("v").as("v1"))
    val r = data.select(col("id").as("id2"), col("v").as("v2"))
    val pairs = l.crossJoin(r).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        Dedup.cosine(col("v1"), col("v2")).as("cosine"))
      .where(col("cosine") >= 0.97)
    val cc = Components.connectedComponents(pairs)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val expected = data.collect().map(_.getLong(0))
      .map(id => id -> cc.getOrElse(id, id)).toMap
    assert(gotMap == expected)
  }

  test("injected near-dups group with their originals across separated modes") {
    val base = modes(4, 10, noise = 0.02)
    val dups = base.filter(_._1 % 1000 < 3).map { case (id, v) =>
      (id + 100000, v.updated(15, v(15) + 0.01)) // nudge one coord
    }
    val df = (base ++ dups).toDF("id", "v")
    val groups = Semantic.semanticGroups(df, "id", "v", tau = 0.995, nlist = 4)
    val m = groups.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    groups.unpersist()
    dups.foreach { case (dupId, _) =>
      assert(m(dupId) == m(dupId - 100000),
        s"dup $dupId not grouped with ${dupId - 100000}")
    }
  }

  test("transitive chain collapses to one survivor even when ends are below tau") {
    // a--b and b--c above tau; a--c below: components must still merge all 3
    val a = Array.tabulate(8)(j => if (j == 0) 1.0 else 0.0)
    def rot(t: Double) = Array.tabulate(8)(j =>
      if (j == 0) math.cos(t) else if (j == 1) math.sin(t) else 0.0)
    val t = 0.25 // cos(0.25)=0.969 >= 0.95; cos(0.5)=0.878 < 0.95
    val df = Seq((1L, a.toSeq), (2L, rot(t).toSeq), (3L, rot(2 * t).toSeq))
      .toDF("id", "v")
    val kept = Semantic.semanticDedup(df, "id", "v", tau = 0.95, nlist = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("degenerate vectors get null list_id, survive, and never pair") {
    val good = modes(2, 5)
    val degen = Seq((9001L, Seq.fill(16)(0.0)), (9002L, Seq.empty[Double]))
    val df = (good ++ degen).toDF("id", "v")
    val groups = Semantic.semanticGroups(df, "id", "v", tau = 0.9, nlist = 2)
    val rows = groups.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getInt(1), r.getLong(2))).toSeq
    groups.unpersist()
    val d = rows.filter(_._1 >= 9000L)
    assert(d.size == 2 && d.forall(x => x._2 == null && x._3 == x._1))
  }

  test("degenerate quantizer: a cluster holding 60% of the corpus stays exact, join keyed on list_id") {
    // Skew-adversarial law (the oversized-cluster story must not rest on
    // an assertion): plant a quantizer whose first centroid captures 60%
    // of all vectors and verify (a) the within-cluster machinery completes
    // and equals brute-force-within-cluster + CC exactly, and (b) the
    // pair search is a list_id-KEYED equi-join (skew-splittable by AQE at
    // real scale; a cartesian/broadcast-nested-loop would not be). The
    // quadratic within-cluster candidate volume (0.6n)² is the documented
    // SemDeDup cost model — nlist ≈ √n is the sizing rule that bounds the
    // EXPECTED cluster; a degenerate quantizer degrades to quadratic
    // within the hot cluster, never to wrong results.
    val rnd = new scala.util.Random(13)
    val hot = (0 until 600).map { i =>
      (i.toLong, Array.tabulate(16)(j =>
        (if (j == 0) 1.0 else 0.0) + 0.05 * rnd.nextGaussian()).toSeq)
    }
    val cold = for (m <- 1 until 5; i <- 0 until 100) yield {
      ((m * 10000 + i).toLong, Array.tabulate(16)(j =>
        (if (j == m) 1.0 else 0.0) + 0.05 * rnd.nextGaussian()).toSeq)
    }
    val df = (hot ++ cold).toDF("id", "v")
    // the planted quantizer: 5 axis centroids — centroid 0 owns all 600
    val cents = Array.tabulate(5)(m => Array.tabulate(16)(j =>
      if (j == m) 1.0 else 0.0))
    val clustered = Semantic.withClusters(df, "id", "v", cents).persist()
    try {
      val share = clustered.groupBy("list_id").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(share(0) == 600L, s"planted hot cluster holds ${share.getOrElse(0, 0L)}")
      // (b) join shape: an equi-join on list_id, no cartesian anywhere
      val pairs = Semantic.semanticPairs(clustered, tau = 0.97)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"within-cluster search must stay a keyed equi-join:\n$plan")
      // (a) exactness vs brute force restricted to same-cluster pairs + CC
      val got = Semantic.semanticGroupsFromClusters(clustered, tau = 0.97)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val withC = clustered.select(col("id"), col("v"), col("list_id"))
      val l = withC.select(col("id").as("id1"), col("v").as("v1"), col("list_id").as("c1"))
      val r = withC.select(col("id").as("id2"), col("v").as("v2"), col("list_id").as("c2"))
      val brute = l.crossJoin(r)
        .where(col("id1") < col("id2") && col("c1") === col("c2"))
        .select(col("id1"), col("id2"), Dedup.cosine(col("v1"), col("v2")).as("cos"))
        .where(col("cos") >= 0.97)
      val cc = Components.connectedComponents(brute)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val expected = (hot ++ cold).map(_._1).map(id => id -> cc.getOrElse(id, id)).toMap
      assert(got == expected, "degenerate-quantizer groups diverge from brute force")
    } finally clustered.unpersist()
  }

  test("semanticDedup keeps exactly the component minima plus unpaired rows") {
    val base = modes(3, 8, noise = 0.02)
    val dups = base.filter(_._1 % 1000 < 2).map { case (id, v) =>
      (id + 100000, v.updated(14, v(14) + 0.01))
    }
    val df = (base ++ dups).toDF("id", "v")
    val groups = Semantic.semanticGroups(df, "id", "v", tau = 0.995, nlist = 3)
    val expectSurvivors = groups.collect()
      .filter(r => r.getLong(2) == r.getLong(0)).map(_.getLong(0)).toSet
    groups.unpersist()
    val kept = Semantic.semanticDedup(df, "id", "v", tau = 0.995, nlist = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == expectSurvivors)
    // every injected dup is dominated by its (smaller-id) original, so none survives
    assert(dups.map(_._1).toSet.intersect(kept).isEmpty)
  }
}
