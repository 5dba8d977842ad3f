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
