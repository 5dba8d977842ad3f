package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — exact, O(|Q|·|C|), broadcast the
  * (small) query side so the corpus never shuffles.
  * Scale path: LSH-bucketed search (sign-random-projection buckets with
  * multiprobe) — candidates only from matching buckets, then exact cosine
  * re-rank; an IVF analog where the "inverted lists" are hash buckets.
  */
object Ann {

  /** Exact brute-force cosine top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k,
    * deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: corpus is bucketed once by sign-LSH signature;
    * queries probe their own bucket plus all 1-bit-flip neighbors
    * (multiprobe, recall boost), then exact cosine re-ranks the candidates.
    * The corpus-side bucket table is reusable across query batches (the
    * "index"). At 1000 executors this is a hash-partitioned join on a long
    * key — no broadcast of the corpus, no O(n²).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int = 10, bits: Int = 8): DataFrame = {
    val sig = Dedup.signLshSignature(col(vecCol), bits)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), sig.as("bucket"))
    // multiprobe: own bucket + flip each of `bits` bits
    val probes = array_union(
      array(sig),
      transform(sequence(lit(0), lit(bits - 1)),
        j => sig.bitwiseXOR(call_function("shiftleft", lit(1L), j))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probes).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
