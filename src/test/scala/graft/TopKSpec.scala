package graft

import graft.stats.TopK
import org.apache.spark.sql.functions._

/** Merge/serialization laws for the bounded top-k aggregates (the same
  * partitioning-invariance contract MinKSpec pins for MinKStringsAgg):
  * a repartitioned run forces partial buffers through serialize →
  * shuffle → deserialize → merge, so `coalesce(1) == repartition(17)`
  * exercises the full TypedImperativeAggregate lifecycle.
  */
class TopKSpec extends GraftSpec {
  import spark.implicits._

  test("top_k_pairs: k best (score desc, id asc) pairs with deterministic tie-breaks") {
    // score = id % 7 → heavy ties; the cut must order ties by id asc
    val df = spark.range(0, 100)
      .select(col("id"), (col("id") % 7).cast("double").as("s"))
    val got = df.agg(TopK.topKPairs(col("s"), col("id"), 5).as("top"))
      .select(explode(col("top")).as("p"))
      .select(col("p.score"), col("p.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // ids with score 6: 6, 13, 20, 27, 34, ... → 5 smallest ids win
    assert(got == Seq((6.0, 6L), (6.0, 13L), (6.0, 20L), (6.0, 27L), (6.0, 34L)))
  }

  test("top_k_pairs is partitioning-invariant (merge keeps the global k best)") {
    val df = spark.range(0, 5000)
      .select(col("id"), (pmod(col("id") * 761, lit(4999)) / 100.0).as("s"))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy((col("id") % 3).as("g"))
        .agg(TopK.topKPairs(col("s"), col("id"), 25).as("top"))
        .select(col("g"), explode(col("top")).as("p"))
        .collect().map(r => (r.getLong(0), r.getStruct(1).getDouble(0),
          r.getStruct(1).getLong(1))).toSeq.sorted
    assert(run(df.coalesce(1)) == run(df.repartition(17)))
  }

  test("top_k_pairs skips null scores/ids and handles fewer-than-k inputs") {
    val df = spark.range(0, 6).select(
      when(col("id") % 2 === 0, col("id").cast("double")).as("s"), col("id"))
    val got = df.agg(TopK.topKPairs(col("s"), col("id"), 100).as("top"))
      .select(explode(col("top")).as("p")).select(col("p.id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(4L, 2L, 0L))
  }

  test("adc_top_k is partitioning-invariant and equals the per-query window cut") {
    import org.apache.spark.sql.expressions.Window
    // synthetic score arrays for 4 queries: deterministic pseudo-scores
    // with ties (floor to one decimal), plus qids present in the corpus
    // so self-exclusion is exercised
    val qids = Array(3L, 7L, 11L, 13L)
    val scored = spark.range(0, 400).select(col("id"),
      transform(sequence(lit(0), lit(3)),
        q => floor(pmod(xxhash64(col("id") * 4 + q), lit(50)) / 5.0) / 10.0)
        .as("scores"))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.agg(TopK.adcTopK(col("id"), col("scores"), qids, 6).as("top"))
        .select(explode(col("top")).as("p"))
        .select(col("p.qidx"), col("p.id"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    val one = run(scored.coalesce(1))
    assert(one == run(scored.repartition(17)))
    // window-cut reference over the exploded pairs
    val w = Window.partitionBy(col("qidx"))
      .orderBy(col("s").desc, col("id").asc)
    val ref = scored.select(col("id"), posexplode(col("scores")).as(Seq("qidx", "s")))
      .where(col("id") =!= element_at(typedLit(qids.toSeq), col("qidx") + 1))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 6)
      .select(col("qidx"), col("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(one == ref)
    assert(!one.exists { case (q, id) => qids(q) == id })
  }

  test("top_k_strings equals the per-group window cut on skewed string keys") {
    import org.apache.spark.sql.expressions.Window
    // zipf-ish repo counts with ties, 3 batches — the repo_metrics shape
    val counts = spark.range(0, 3000).select(
      (col("id") % 3).as("b"),
      concat(lit("repo_"), lpad((pmod(xxhash64(col("id")), lit(200))).cast("string"), 4, "0")).as("repo"))
      .groupBy("b", "repo").agg(count(lit(1)).as("n"))
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("b")
        .agg(TopK.topKStrings(col("n"), col("repo"), 15).as("t"))
        .select(col("b"), posexplode(col("t")).as(Seq("pos", "p")))
        .select(col("b"), col("p.item"), col("p.count"),
          (col("pos") + 1).cast("long").as("rank"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    val got = agg(counts.coalesce(1))
    assert(got == agg(counts.repartition(17))) // merge/serialize lifecycle
    val w = Window.partitionBy(col("b")).orderBy(col("n").desc, col("repo").asc)
    val ref = counts.withColumn("rank", row_number().over(w)).where(col("rank") <= 15)
      .select(col("b"), col("repo"), col("n"), col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == ref)
  }

  test("top_k_strings orders non-ASCII ties by UTF-8 bytes like Spark, not UTF-16") {
    // U+FF01 (ef bc 81 in UTF-8) vs U+10000 (f0 90 80 80): UTF-16 order
    // puts U+FF01 after the surrogate pair's first unit? No — '！' >
    // "𐀀" by code units, while UTF-8 bytes order them the other
    // way. The aggregate must agree with Spark's sort.
    val df = Seq(("！x", 5L), ("𐀀x", 5L), ("a", 5L)).toDF("k", "n")
    val got = df.agg(TopK.topKStrings(col("n"), col("k"), 3).as("t"))
      .select(explode(col("t")).as("p")).select(col("p.item"))
      .collect().map(_.getString(0)).toSeq
    val ref = df.orderBy(col("n").desc, col("k").asc)
      .collect().map(_.getString(0)).toSeq
    assert(got == ref)
  }
}
