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

    // ONE scan of the input: per-(raw group, distinct value) counts. The
    // total row count `n` keeps null/NaN values so the top-group cut sees
    // the same per-group row counts a plain groupBy(group).count() would;
    // c1/c2 count the clean baseline/current rows (NULL isBaseline →
    // neither side, like a filter). Everything downstream — the top-group
    // naming, the lane-keyed KS counts and the per-group moments — runs
    // over this bounded (groups × distinct values) table; the previous
    // shape re-scanned the full input three times (top cut, KS melt,
    // conditional moments agg).
    val gv = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("n"),
        sum(when(isBaseline, 1L).otherwise(0L)).as("s1"),
        sum(when(!isBaseline, 1L).otherwise(0L)).as("s2"))
      .persist()
    try {
      val top = gv.groupBy("g").agg(sum("n").as("count"))
        .orderBy(desc("count"), col("g"))
        .limit(maxGroups)
        .select(col("g")).as[String].collect().sorted
      val names = top.toSeq :+ OtherGroup
      val laneOf = names.zipWithIndex.toMap

      // lanes = (possibly __other__-lumped) groups through the shared
      // two-phase KS machinery — a driver-side literal when-chain maps the
      // bounded group set to lane ids, no join needed
      val lane = names.zipWithIndex.foldLeft(lit(laneOf(OtherGroup))) {
        case (els, (n, i)) =>
          if (n == OtherGroup) els else when(col("g") === n, i).otherwise(els)
      }
      val counts = gv
        .where(col("v").isNotNull && !isnan(col("v")))
        .select(lane.as("cid"), col("v"), col("s1").as("c1"), col("s2").as("c2"))
        .groupBy("cid", "v").agg(sum("c1").as("c1"), sum("c2").as("c2"))
        .persist()
      try {
        // action: per-lane first-pass moments + KS boundary percentiles in
        // ONE collect (materializes counts); then the max-gap job and the
        // shifted-M2 std job run CONCURRENTLY over the persisted table
        val first = Drift.laneFirstPass(counts, 32)
        val shifts = Drift.stdShifts(first)
        var ksRows: Array[org.apache.spark.sql.Row] = Array.empty
        var m2ByCid: Map[Int, Double] = Map.empty
        val jobs = Seq.newBuilder[() => Unit]
        jobs += { () =>
          ksRows = KsTest.ksMaxGapFromCounts(counts, 32,
            Some(first.toSeq.map { case (cid, f) => cid -> f.bounds })).collect()
        }
        if (shifts.nonEmpty) jobs += { () => m2ByCid = Drift.laneM2(counts, shifts) }
        Drift.inParallel(jobs.result())
        val ksByLane = ksRows
          .map(r => r.getInt(0) ->
            ((if (r.isNullAt(1)) 0.0 else r.getDouble(1)), r.getLong(2), r.getLong(3)))
          .toMap
        // a constant-valued lane yields std exactly 0 (stddev_samp parity)
        val moments = Drift.sidesFrom(first, m2ByCid)

        val out = moments.toSeq.map { case (cid, m) =>
          val name = names(cid)
          val (num, n1, n2) = ksByLane.getOrElse(cid, (0.0, 0L, 0L))
          val (d, p) =
            if (n1 > 0 && n2 > 0) {
              val s = num / (n1.toDouble * n2.toDouble)
              (s, DriftMath.ksPValue(s, n1, n2))
            } else (0.0, 1.0)
          // empty-side means surface as SQL NULL (not NaN) — what an
          // external recompute's avg() over zero rows yields; the shift
          // stays 0.0 there (meanDifference's NaN guard)
          (name, d, p, if (m.m1.isNaN) None else Some(m.m1),
            if (m.m2.isNaN) None else Some(m.m2),
            Drift.meanDifference(m.m1, m.s1, m.m2), n1, n2, p < alpha)
        }.sortBy(_._1)
        out.toDF("group", "ks_stat", "ks_p", "mean_base", "mean_cur",
          "mean_shift", "n_base", "n_cur", "drifted")
      } finally counts.unpersist()
    } finally gv.unpersist()
  }
}
