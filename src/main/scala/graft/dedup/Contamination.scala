package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: flag corpus
  * documents that share word n-grams with an evaluation/benchmark set, the
  * published decontamination method (GPT-3, Brown et al. 2020 §C uses
  * 13-gram overlap; The Pile and subsequent open pipelines the same shape).
  * The reference engine has no equivalent — this extends the
  * training-data-pipeline surface (SURVEY §2.12 family).
  *
  * Scale shape: the eval side is always tiny (benchmarks are MBs; the
  * corpus is the 100 TB side), so its distinct gram-hash set is built once
  * and BROADCAST — the corpus is scanned exactly once, its grams never
  * shuffle as strings (64-bit [[Dedup.shingleHashes]] keys only), and the
  * only exchange is the map-side-combined per-doc count rollup (one row
  * per document per task). Nothing driver-side, no row-scale collect.
  *
  * Gram equality is tested on xxhash64 of the gram string; a collision
  * between two distinct grams could overcount overlap by 1 (probability
  * ~|grams|²/2⁶⁴ — negligible, and deterministic for a given corpus). The
  * DuckDB oracle joins the gram STRINGS re-derived from raw text, so the
  * gate would catch a collision if one ever mattered.
  */
object Contamination {

  /** Per-document contamination report.
    *
    * @param corpus     training-corpus documents
    * @param evalSet    benchmark documents (small side — broadcast)
    * @param idCol      corpus document id column
    * @param textCol    text column (same name on both sides)
    * @param n          word n-gram width (13 at deploy per the GPT-3
    *                   protocol; smaller at test scale so synthetic docs
    *                   can overlap at all)
    * @param minOverlap distinct shared grams needed to flag a document
    * @return (doc_id, total_grams, overlap_grams, overlap_frac,
    *         contaminated) — `total_grams` counts the document's DISTINCT
    *         grams ([[Dedup.shingleHashes]] dedups per doc), so
    *         `overlap_frac` is the fraction of the document's distinct
    *         grams that appear anywhere in the eval set. Documents shorter
    *         than `n` words contribute their whole normalized text as one
    *         gram (the [[Dedup.shingleHashes]] convention, both sides).
    */
  def report(corpus: DataFrame, evalSet: DataFrame, idCol: String,
             textCol: String, n: Int = 13, minOverlap: Int = 1): DataFrame = {
    val evalGrams = broadcast(
      evalSet.select(explode(Dedup.shingleHashes(col(textCol), n)).as("g"))
        .distinct()
        .withColumn("hit", lit(1)))
    corpus
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingleHashes(col(textCol), n)).as("g"))
      .join(evalGrams, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("total_grams"),
        count(col("hit")).as("overlap_grams"))
      .withColumn("overlap_frac",
        round(col("overlap_grams").cast("double") / col("total_grams"), 4))
      .withColumn("contaminated", col("overlap_grams") >= minOverlap)
  }
}
