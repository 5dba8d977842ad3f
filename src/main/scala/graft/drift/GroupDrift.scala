package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stratified (per-group) drift detection: exact two-sample KS and the
  * reference's normalized mean shift, computed WITHIN each group of a
  * stratification column. A global test can miss subpopulation drift
  * entirely — content length drifting up in one language while drifting
  * down in another nets to a flat global ECDF — and the reference's
  * detector (DESIGN.md:560-575) is global-only, so this extends the core
  * validation semantics rather than wrapping them.
  *
  * Scale shape (one job pair regardless of group count, never a per-group
  * loop):
  *  - group naming is a map-side-combined count + `TakeOrdered(maxGroups)`
  *    — the top groups by row count become lanes, everything else lumps
  *    into `__other__` so coverage stays total and driver state stays
  *    bounded. NULL groups are excluded (the A30 convention: a row with no
  *    stratum sits on neither side of any per-group comparison).
  *  - the KS melt is [[KsTest.ks2SampMulti]]'s bucketed two-phase
  *    prefix-sum machinery with lanes keyed by GROUP instead of by melted
  *    column: all groups share ONE (lane, value) shuffle, every window is
  *    partitioned by (lane, bucket), and per-lane equi-depth boundaries
  *    keep any single partition bounded even when one group holds 60% of
  *    the corpus.
  *  - means/stds ride one conditional aggregation; rows with a NULL
  *    baseline condition fall out of both sides (`when` without otherwise).
  *
  * Output: one row per non-empty group —
  * `(group, ks_stat, ks_p, mean_base, mean_cur, mean_shift, n_base,
  * n_cur, drifted)` with `drifted = ks_p < alpha` (groups with an empty
  * side get KS 0 / p 1, the [[KsTest.ks2SampMulti]] convention).
  */
object GroupDrift {

  val OtherGroup = "__other__"

  /** Novel-category detection — the categorical analog of the schema gate:
    * values present on the current side but NEVER seen in the baseline
    * (a new `lang` string, a new event type). Chi-square/PSI react to a
    * novel category only through mass shift; this names the values
    * directly, with counts, which is what an alert needs.
    *
    * One map-side-combined groupBy over both sides together (the melted
    * s1/s2 trick — never two scans), then a filter on the grouped table:
    * baseline count 0 ∧ current count ≥ `minCount`. NULL values excluded
    * (a null is a completeness violation, not a category); NULL conditions
    * sit on neither side (A30). Output `(value, n_cur)` — bounded by the
    * column's NOVEL cardinality, and `minCount` guards against a tail of
    * singleton typos at 10^12 rows.
    */
  def novelCategories(df: DataFrame, catCol: String, isBaseline: Column,
                      minCount: Long = 1L): DataFrame =
    df.where(col(catCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("value"))
      .agg(sum(when(isBaseline, 1L).otherwise(0L)).as("n_base"),
        sum(when(!isBaseline, 1L).otherwise(0L)).as("n_cur"))
      .where(col("n_base") === 0L && col("n_cur") >= minCount)
      .select("value", "n_cur")

  def ksMeanByGroup(df: DataFrame, groupCol: String, valueCol: String,
                    isBaseline: Column, maxGroups: Int = 64,
                    alpha: Double = 0.05): DataFrame = {
    require(maxGroups >= 1, s"maxGroups must be >= 1, got $maxGroups")
    val spark = df.sparkSession
    import spark.implicits._

    val top = df.where(col(groupCol).isNotNull)
      .groupBy(groupCol).count()
      .orderBy(desc("count"), col(groupCol))
      .limit(maxGroups)
      .select(col(groupCol).cast("string")).as[String].collect().sorted
    val names = top.toSeq :+ OtherGroup
    val laneOf = names.zipWithIndex.toMap

    val g = when(col(groupCol).cast("string").isin(top.toSeq: _*),
      col(groupCol).cast("string")).otherwise(OtherGroup)
    val clean = df.where(col(groupCol).isNotNull)
      .select(g.as("g"), col(valueCol).cast("double").as("v"),
        when(isBaseline, 1L).otherwise(0L).as("s1"),
        when(!isBaseline, 1L).otherwise(0L).as("s2"))
      .where(col("v").isNotNull && !isnan(col("v")))

    // lanes = groups through the shared two-phase KS machinery
    val laneDf = broadcast(names.zipWithIndex.map { case (n, i) => (n, i) }
      .toDF("g", "cid"))
    // persisted for the same reason ks2SampMulti persists: the machinery
    // runs a boundary-percentile collect over counts and then the final
    // max-gap job re-reads it — unpersisted, the full melt+join+groupBy
    // would recompute for each
    val counts = clean.join(laneDf, Seq("g"))
      .groupBy("cid", "v").agg(sum("s1").as("c1"), sum("s2").as("c2"))
      .persist()
    val ksByLane =
      try KsTest.ksMaxGapFromCounts(counts, 32).collect()
        .map(r => r.getInt(0) ->
          ((if (r.isNullAt(1)) 0.0 else r.getDouble(1)), r.getLong(2), r.getLong(3)))
        .toMap
      finally counts.unpersist()

    // one conditional aggregation for means/stds (bounded: ≤ maxGroups+1 rows)
    val mRows = clean
      .groupBy("g").agg(
        avg(when(col("s1") === 1L, col("v"))).as("mean_base"),
        stddev_samp(when(col("s1") === 1L, col("v"))).as("std_base"),
        avg(when(col("s2") === 1L, col("v"))).as("mean_cur"))
      .collect()

    val out = mRows.map { r =>
      val name = r.getString(0)
      val (num, n1, n2) = ksByLane.getOrElse(laneOf(name), (0.0, 0L, 0L))
      val (d, p) =
        if (n1 > 0 && n2 > 0) {
          val s = num / (n1.toDouble * n2.toDouble)
          (s, DriftMath.ksPValue(s, n1, n2))
        } else (0.0, 1.0)
      // empty-side means surface as SQL NULL (not NaN) — what an external
      // recompute's avg() over zero rows yields; the shift stays 0.0 there
      // (meanDifference's NaN guard)
      val mb = if (r.isNullAt(1)) Double.NaN else r.getDouble(1)
      val sb = if (r.isNullAt(2)) Double.NaN else r.getDouble(2)
      val mc = if (r.isNullAt(3)) Double.NaN else r.getDouble(3)
      (name, d, p, if (mb.isNaN) None else Some(mb),
        if (mc.isNaN) None else Some(mc),
        Drift.meanDifference(mb, sb, mc), n1, n2, p < alpha)
    }.sortBy(_._1).toSeq
    out.toDF("group", "ks_stat", "ks_p", "mean_base", "mean_cur",
      "mean_shift", "n_base", "n_cur", "drifted")
  }
}
