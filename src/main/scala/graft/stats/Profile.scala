package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ-style column profiler (the published analyzer set: Schelter et
  * al., "Automating Large-Scale Data Quality Verification", VLDB 2018 —
  * Completeness, Distinctness, Uniqueness, UniqueValueRatio, Entropy):
  * one row of profile metrics per requested column, ALL columns sharing a
  * single melted shuffle — the [[graft.drift.KsTest.ks2SampMulti]] width
  * rule (a caller looping per column pays the per-job fixed cost times
  * the table width; at 10^12 rows the scan IS the job).
  *
  * Metric definitions pinned (all Deequ's):
  *  - completeness   = non-null / rows
  *  - distinctness   = distinct non-null values / non-null
  *  - uniqueness     = values occurring exactly once / non-null
  *  - unique_ratio   = values occurring exactly once / distinct
  *  - entropy        = −Σ p·ln p over non-null value frequencies,
  *    computed as ln N − (Σ c·ln c)/N — an exact identity that needs the
  *    value-count table only once, no second pass and no persist
  *  - top_value      = most frequent non-null value, ties broken toward
  *    the lexicographically LARGEST string (max(struct(cnt, v)) — pinned
  *    so an external recompute can mirror it deterministically);
  *    top_ratio = its count / non-null
  *
  * Values are profiled through their STRING rendering (the melt must be
  * one column type); callers oracling doubles should note that float
  * formatting differs across engines — integers/strings/dates are stable.
  *
  * Shape: melt → one map-side-combined groupBy (column, value) → one
  * aggregation to #columns rows. Value counts shuffle once; no window, no
  * driver state beyond the #columns result.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    require(cols.distinct.size == cols.size,
      s"profile: duplicate column names in ${cols.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val melted = df.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), col(c).cast("string").as("v"))
    }: _*)).as("nv")).select(col("nv.cid").as("cid"), col("nv.v").as("v"))
    val counts = melted.groupBy("cid", "v").agg(count(lit(1)).as("cnt"))
    val agg = counts.groupBy("cid").agg(
      sum("cnt").as("n_rows"),
      sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
      count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
      sum(when(col("v").isNotNull && col("cnt") === 1L, 1L).otherwise(0L))
        .as("n_unique"),
      sum(when(col("v").isNotNull,
        col("cnt").cast("double") * log(col("cnt").cast("double")))
        .otherwise(0.0)).as("clc"),
      max(when(col("v").isNotNull, struct(col("cnt"), col("v")))).as("top"))
    val names = broadcast(cols.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cid", "col_name"))
    val nn = (col("n_rows") - col("n_nulls")).cast("double")
    agg.join(names, Seq("cid"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        (nn / col("n_rows")).as("completeness"),
        col("n_distinct"),
        when(nn > 0, col("n_distinct") / nn).otherwise(0.0).as("distinctness"),
        col("n_unique"),
        when(nn > 0, col("n_unique") / nn).otherwise(0.0).as("uniqueness"),
        when(col("n_distinct") > 0, col("n_unique") / col("n_distinct").cast("double"))
          .otherwise(0.0).as("unique_ratio"),
        when(nn > 0, log(nn) - col("clc") / nn).otherwise(0.0).as("entropy"),
        col("top.v").as("top_value"),
        when(nn > 0, col("top.cnt") / nn).otherwise(0.0).as("top_ratio"))
  }
}
