package graft

import graft.stats.FreqSketch
import org.apache.spark.sql.functions._

class FreqSketchSpec extends GraftSpec {
  import spark.implicits._

  // Zipf-ish corpus: key k appears ~1000/k times — a few mega-keys over a
  // long tail, the shape heavy-hitter detection exists for.
  private def skewed(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) { s"repo${(1000.0 / (1 + rnd.nextInt(999))).toInt}" }
  }

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact regime: heavy hitters == exact GROUP BY counts, lb == ub == est") {
    val xs = skewed(20000, 7)
    val truth = exactCounts(xs)
    val got = FreqSketch.heavyHitters(xs.toDF("k"), "k", threshold = 50L,
        maxMapSize = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = truth.filter(_._2 >= 50L)
    assert(got.map(r => r._1 -> r._2).toMap == want)
    assert(got.forall(r => r._2 == r._3 && r._3 == r._4)) // no error band
  }

  test("partitioning invariance in the exact regime") {
    val df = skewed(20000, 11).toDF("k")
    def run(parts: Int) =
      FreqSketch.heavyHitters(df.repartition(parts), "k", 40L, 4096)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(1) == run(13))
  }

  test("merge law: merged per-half sketch bytes == whole-corpus sketch") {
    val xs = skewed(10000, 3)
    val (a, b) = xs.splitAt(5000)
    def bytes(ys: Seq[String]) =
      ys.toDF("k").agg(FreqSketch.freqItemsAgg(col("k"), 4096))
        .collect()(0).getAs[Array[Byte]](0)
    val merged = FreqSketch.heapify(FreqSketch.mergeBytes(bytes(a), bytes(b)))
    val whole = FreqSketch.heapify(bytes(xs))
    val keys = exactCounts(xs).keySet
    assert(keys.forall(k => merged.getEstimate(k) == whole.getEstimate(k)))
    // commutativity
    val ba = FreqSketch.heapify(FreqSketch.mergeBytes(bytes(b), bytes(a)))
    assert(keys.forall(k => ba.getEstimate(k) == whole.getEstimate(k)))
  }

  test("approximate regime: bounds bracket truth, frequent items never missed") {
    val xs = skewed(30000, 19)
    val truth = exactCounts(xs)
    // tiny map → heavy purging; epsilon = N / (2 * maxMapSize)
    val maxMap = 64
    val eps = xs.size / (2.0 * maxMap)
    val threshold = (3 * eps).toLong
    val got = FreqSketch.heavyHitters(xs.toDF("k"), "k", threshold, maxMap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (k, est, lb, ub) =>
      val t = truth.getOrElse(k, 0L)
      assert(lb <= t && t <= ub, s"$k: bounds [$lb,$ub] miss true $t")
      assert(t <= est && est <= t + 2 * eps + 1, s"$k: est $est vs true $t")
    }
    // NO_FALSE_NEGATIVES: every truly-frequent key is reported
    val reported = got.map(_._1).toSet
    truth.filter(_._2 >= threshold).keys.foreach(k =>
      assert(reported.contains(k), s"frequent key $k missing"))
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("k")
    val got = FreqSketch.heavyHitters(df, "k", 1L, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("maxMapSize must be a power of two") {
    intercept[IllegalArgumentException] {
      stats.FreqItemsAgg(null, maxMapSize = 100)
    }
  }
}
