package graft.suite

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for repo-keyed aggregations (north rule:
  * "repartition-by-repo-hash plus salting for skewed mega-repos").
  *
  * The generated table (like real code corpora) has one mega-repo holding
  * ~30% of all rows; a plain `groupBy(repo)` sends all of it to one reducer.
  * Because every aggregation state the engine uses is MERGEABLE (counts,
  * moments, HLL, t-digest — property-tested), a salted two-level aggregate
  * is exact:
  *   level 1: groupBy(repo, salt = pmod(xxhash64(path, commit), S)) partials
  *   level 2: groupBy(repo) merge of ≤ S partials per repo.
  * AQE's skew mitigation only covers joins, not aggregations — this path is
  * the engine's own (SURVEY.md §4 "Skew handling").
  */
object Salting {
  val DefaultBuckets = 16

  private def saltCol(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets))

  /** Exact per-key row count via salted two-level aggregation. */
  def saltedCount(df: DataFrame, key: String, buckets: Int = DefaultBuckets,
                  saltSource: Seq[String] = Seq.empty): DataFrame = {
    val src = if (saltSource.nonEmpty) saltSource.map(col) else Seq(monotonically_increasing_id())
    df.groupBy(col(key), saltCol(buckets, src: _*).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("count"))
  }

  /** Salted two-level aggregation for arbitrary mergeable aggregates:
    * `partials` computed per (key, salt), then `merges` combine them per key.
    * Caller guarantees each (partial, merge) pair is a homomorphism
    * (sum/sum, count/sum, min/min, max/max, hll/hll_union, tdigest/merge…).
    */
  def saltedAgg(df: DataFrame, key: String, saltSource: Seq[String], buckets: Int)(
      partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.groupBy(col(key), saltCol(buckets, saltSource.map(col): _*).as("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
}
