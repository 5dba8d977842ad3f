package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.stats.Stats

/** Per-column drift report row, shaped after the reference DriftDetector
  * report (DESIGN.md:575-580): {p_value, statistic, drift_detected,
  * mean_difference} per feature + overall rollup, extended with the
  * north-star PSI / chi-square checks.
  */
case class ColumnDrift(
    column: String,
    test: String,          // ks | psi | chisq
    statistic: Double,
    p_value: Double,       // NaN for PSI (no p-value; thresholded directly)
    drift_detected: Boolean,
    mean_difference: Double, // |ref_mean − cur_mean| / ref_std (DESIGN.md:569)
    n_ref: Long,
    n_cur: Long)

case class DriftReport(
    overall_drift_detected: Boolean, // any column drifted (DESIGN.md:572-573)
    feature_drift: Seq[ColumnDrift],
    sample_size: Long)

object Drift {
  val KsThreshold = 0.05    // DESIGN.md:534
  val PsiThreshold = 0.2    // standard PSI "significant shift" convention
  val ChiSqThreshold = 0.05
  /** Driver-side category cap: every categorical check collects at most
    * this many categories per column (ranked by baseline count, ties broken
    * deterministically) plus ONE aggregated tail bucket. Below the cap the
    * result is identical to the uncapped formula up to floating-point
    * summation ORDER (the capped path ranks categories baseline-count-desc,
    * so the PSI/chi-square sums may differ in the last ulp from an
    * arbitrary-order evaluation); above it the verdict is the capped
    * formula's (the same LenCardCap hazard class the suite already bounds —
    * a 10^6-distinct categorical must not OOM the driver).
    */
  val CatTopK = 1000
  /** Tail-bucket label; the \u0001 prefix keeps it out of any real
    * category's namespace.
    */
  val OtherBucket = "\u0001__other__"
  /** Fails the job loudly if a REAL category value equals the reserved tail
    * sentinel — a silent merge into the tail bucket would change the
    * statistic versus the uncapped formula even below the cap. Evaluated on
    * the (small) grouped distinct-value table, so the guard is free.
    */
  private def guardSentinel(v: Column): Column =
    when(v === lit(OtherBucket), raise_error(lit(
      "categorical value collides with the reserved tail sentinel " +
        "\\u0001__other__ — rename or filter it before drift detection")))
      .otherwise(v)

  /** Salt fan-out for the melted top-K ranking in [[detect]]: a column with
    * C distinct categories is ranked in parallel partitions of ≈ C/fanout
    * rows (phase 1), then the ≤ fanout·CatTopK survivors re-rank (phase 2) —
    * no single task ever sorts a whole column's category table.
    */
  val CatSaltFanout = 32

  /** |Δmean| / ref_std, 0 when ref_std == 0 or undefined (DESIGN.md:569). */
  def meanDifference(refMean: Double, refStd: Double, curMean: Double): Double =
    if (refStd.isNaN || refStd == 0.0 || refMean.isNaN || curMean.isNaN) 0.0
    else math.abs(refMean - curMean) / refStd

  /** PSI over numeric columns, ALL sharing two jobs regardless of width
    * (the [[KsTest.ks2SampMulti]] shape): job 1 gets every column's
    * BASELINE [min, max] in one conditional aggregation; job 2 computes
    * every column's 10-bin histogram on both sides from one melted pass.
    * Per column the formula is exactly the single-column one: bins pinned
    * to the baseline's [min, max], out-of-range current values clamped
    * into the edge bins. A caller looping [[psiNumeric]] over a wide table
    * instead pays 2 driver actions PER column — the fixed-cost class
    * measured as the small-input scaling killer.
    */
  def psiNumericMulti(df: DataFrame, valueCols: Seq[String], isBaseline: Column,
                      bins: Int = Stats.Bins): Map[String, Double] = {
    require(valueCols.distinct.size == valueCols.size,
      s"psiNumericMulti: duplicate column names in ${valueCols.mkString(", ")}")
    if (valueCols.isEmpty) return Map.empty
    // job 1: per-column baseline [min, max] in ONE conditional agg (min/max
    // skip nulls, so the when-guard also drops non-baseline rows and NaNs)
    val aggs = valueCols.zipWithIndex.flatMap { case (c, i) =>
      val v = col(c).cast("double")
      val vb = when(isBaseline && v.isNotNull && !isnan(v), v)
      Seq(min(vb).as(s"__lo$i"), max(vb).as(s"__hi$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def d(n: String): Option[Double] =
      Option(row.getAs[Any](n)).map(_.asInstanceOf[Number].doubleValue())
    val ranges = valueCols.indices.map(i => (d(s"__lo$i"), d(s"__hi$i")))
    val live = valueCols.zipWithIndex.filter { case (_, i) => ranges(i)._1.isDefined }
    if (live.isEmpty) return valueCols.map(_ -> 0.0).toMap
    // job 2: melted (column, bin) histograms for BOTH sides in one pass;
    // each lane gets its own baseline-pinned bucket edges via a cid-switch
    val structs = live.map { case (c, i) =>
      struct(lit(i).as("cid"), col(c).cast("double").as("v"))
    }
    // NULL isBaseline → neither side (both whens fall to 0), like a filter
    val melted = df.select(explode(array(structs: _*)).as("nv"),
        when(isBaseline, 1L).otherwise(0L).as("s1"),
        when(!isBaseline, 1L).otherwise(0L).as("s2"))
      .select(col("nv.cid").as("cid"), col("nv.v").as("v"), col("s1"), col("s2"))
      .where(col("v").isNotNull && !isnan(col("v")))
    val bucket = live.foldLeft(lit(0)) { case (acc, (_, i)) =>
      when(col("cid") === i,
        greatest(lit(0), Stats.bucketExpr(col("v"), ranges(i)._1.get, ranges(i)._2.get, bins)))
        .otherwise(acc)
    }
    val hists = melted.groupBy(col("cid"), bucket.as("bin"))
      .agg(sum("s1").as("c1"), sum("s2").as("c2"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rs) =>
        cid -> rs.map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
      }
    valueCols.zipWithIndex.map { case (c, i) =>
      val h = hists.getOrElse(i, Map.empty[Int, (Long, Long)])
      val n1 = h.values.map(_._1).sum.toDouble
      val n2 = h.values.map(_._2).sum.toDouble
      c -> (if (ranges(i)._1.isEmpty || n1 == 0 || n2 == 0) 0.0
            else {
              val p = (0 until bins).map(j => h.getOrElse(j, (0L, 0L))._1 / n1)
              val q = (0 until bins).map(j => h.getOrElse(j, (0L, 0L))._2 / n2)
              DriftMath.psi(p, q)
            })
    }.toMap
  }

  /** PSI over a numeric column: 10 equi-width bins pinned to the BASELINE
    * side's [min, max] (out-of-range current values clamp into edge bins).
    * Single-column convenience over [[psiNumericMulti]] — wide callers
    * should pass all columns at once (constant job count).
    */
  def psiNumeric(df: DataFrame, valueCol: String, isBaseline: Column,
                 bins: Int = Stats.Bins): Double =
    psiNumericMulti(df, Seq(valueCol), isBaseline, bins)(valueCol)

  /** PSI over categorical columns, ALL sharing the one melted salted
    * capped-count job ([[meltedCatCounts]] — the [[detect]] shape). Per
    * column: proportions over the union of both sides' categories, capped
    * to the top `topK` (by baseline count) + one tail bucket, so
    * arbitrary-cardinality categoricals stay driver-safe.
    */
  def psiCategoricalMulti(df: DataFrame, catCols: Seq[String], isBaseline: Column,
                          topK: Int = CatTopK): Map[String, Double] = {
    meltedCatCounts(df, catCols, isBaseline, topK).map { case (c, rows) =>
      val n1 = rows.map(_._2).sum.toDouble
      val n2 = rows.map(_._3).sum.toDouble
      c -> (if (n1 == 0 || n2 == 0) 0.0
            else DriftMath.psi(rows.map(_._2 / n1).toSeq, rows.map(_._3 / n2).toSeq))
    }
  }

  /** PSI over a categorical column — single-column convenience over
    * [[psiCategoricalMulti]]; equal to the uncapped formula below the cap
    * up to floating-point summation order.
    */
  def psiCategorical(df: DataFrame, catCol: String, isBaseline: Column,
                     topK: Int = CatTopK): Double =
    psiCategoricalMulti(df, Seq(catCol), isBaseline, topK)(catCol)

  /** Chi-square goodness-of-fit of the CURRENT categorical frequencies
    * against expected = baseline proportions × current total. Categories
    * absent from the baseline are excluded from the statistic (matching the
    * reference's skip-missing-columns convention, DESIGN.md:557-558);
    * dof = (#baseline categories − 1). Shares [[meltedCatCounts]]; for many
    * columns call it once and [[chiSqGof]] per entry.
    */
  def chiSquareCategorical(df: DataFrame, catCol: String, isBaseline: Column,
                           topK: Int = CatTopK): (Double, Double, Long) =
    chiSquareCategoricalMulti(df, Seq(catCol), isBaseline, topK)(catCol)

  /** Chi-square over several categorical columns sharing the one melted
    * salted capped-count job ([[meltedCatCounts]]). Returns
    * (statistic, p-value, dof) per column — constant job count in width.
    */
  def chiSquareCategoricalMulti(df: DataFrame, catCols: Seq[String], isBaseline: Column,
                                topK: Int = CatTopK): Map[String, (Double, Double, Long)] =
    meltedCatCounts(df, catCols, isBaseline, topK).map { case (c, rows) =>
      c -> chiSqGof(rows.map(r => r._1 -> r._2).toMap,
        rows.map(r => r._1 -> r._3).toMap)
    }

  /** Every categorical column's per-side category counts in ONE melted
    * groupBy, capped per column to the top `topK` categories + one
    * aggregated [[OtherBucket]] tail row, so the collect is
    * ≤ #cols × (topK+1) rows no matter the column cardinality (same hazard
    * class as the suite's LenCardCap). The top-K extraction is SALTED
    * two-phase so no single task ever sorts a whole column's category
    * table: phase 1 ranks within (name, salt) partitions
    * (≈ cardinality/[[CatSaltFanout]] rows each) and folds per-salt tails
    * into the other-bucket; phase 2 re-ranks the ≤ fanout·K surviving
    * names. Exact vs a single per-column ranking: a globally top-K category
    * is a fortiori top-K within its salt bucket, so phase 1 never drops
    * one. Shared by [[detect]], [[psiCategoricalMulti]] and
    * [[chiSquareCategorical]] — every categorical consumer pays one job.
    *
    * Returns, per column, (value, baselineCount, currentCount) rows.
    */
  private[graft] def meltedCatCounts(df: DataFrame, catCols: Seq[String],
                                     isBaseline: Column, topK: Int = CatTopK)
      : Map[String, Array[(String, Long, Long)]] = {
    require(catCols.distinct.size == catCols.size,
      s"meltedCatCounts: duplicate column names in ${catCols.mkString(", ")}")
    if (catCols.isEmpty) return Map.empty
    val structs = catCols.map(c => struct(lit(c).as("name"), col(c).cast("string").as("v")))
    val w = org.apache.spark.sql.expressions.Window
    val salt = pmod(xxhash64(col("v")), lit(CatSaltFanout))
    val perSalt = w.partitionBy(col("name"), salt)
      .orderBy(col("c1").desc, col("c2").desc, col("v"))
    // other-bucket rows sort AFTER every real category (boolean first key)
    // so they never consume a phase-2 rank slot
    val perCol = w.partitionBy("name")
      .orderBy((col("vc") === OtherBucket).asc, col("c1").desc, col("c2").desc, col("vc"))
    // NULL isBaseline → neither side (both whens fall to 0), like a filter
    val rows = df.select(explode(array(structs: _*)).as("nv"),
        when(isBaseline, 1L).otherwise(0L).as("s1"),
        when(!isBaseline, 1L).otherwise(0L).as("s2"))
      .select(col("nv.name").as("name"), col("nv.v").as("v"), col("s1"), col("s2"))
      .where(col("v").isNotNull)
      .groupBy("name", "v").agg(sum("s1").as("c1"), sum("s2").as("c2"))
      .withColumn("v", guardSentinel(col("v")))
      .withColumn("vc", when(row_number().over(perSalt) <= topK, col("v"))
        .otherwise(lit(OtherBucket)))
      .groupBy("name", "vc").agg(sum("c1").as("c1"), sum("c2").as("c2"))
      .withColumn("vc", when(col("vc") =!= OtherBucket &&
          row_number().over(perCol) <= topK, col("vc"))
        .otherwise(lit(OtherBucket)))
      .groupBy("name", "vc").agg(sum("c1").as("c1"), sum("c2").as("c2"))
      .collect()
    val byName = rows.groupBy(_.getString(0))
    catCols.map { c =>
      c -> byName.getOrElse(c, Array.empty)
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    }.toMap
  }

  /** Full drift report over numeric columns (KS, reference DriftDetector
    * semantics) + optional categorical columns (chi-square), baseline vs
    * current selected by `isBaseline`. Columns with no data on either side
    * are skipped (DESIGN.md:557-558).
    *
    * Bounded job count regardless of column width: ONE conditional
    * aggregation gets both sides' (count, mean, std) for every numeric
    * column in a single scan; all numeric columns share the distributed
    * multi-column exact KS ([[KsTest.ks2SampMulti]], 3 jobs); all
    * categorical columns share one melted groupBy. Total ≤ 5 jobs for any
    * number of columns (vs the old 2 + 2·#columns).
    */
  def detect(df: DataFrame, numericCols: Seq[String], catCols: Seq[String],
             isBaseline: Column, ksThreshold: Double = KsThreshold): DriftReport = {
    // a duplicated name would silently double every melted count (and so the
    // chi-square statistic) / collide the conditional-agg aliases — refuse
    require(numericCols.distinct.size == numericCols.size,
      s"detect: duplicate numeric columns in ${numericCols.mkString(", ")}")
    require(catCols.distinct.size == catCols.size,
      s"detect: duplicate categorical columns in ${catCols.mkString(", ")}")
    // job 1: both sides' moments per numeric column in one conditional agg
    case class Sides(n1: Long, m1: Double, s1: Double, n2: Long, m2: Double)
    val sides: Map[String, Sides] = if (numericCols.isEmpty) Map.empty else {
      val aggs = numericCols.flatMap { c =>
        val clean = when(Stats.missingPred(df, c), null).otherwise(col(c).cast("double"))
        val vb = when(isBaseline, clean)
        val vc = when(!isBaseline, clean)
        Seq(count(vb).as(s"${c}__n1"), avg(vb).as(s"${c}__m1"),
          stddev_samp(vb).as(s"${c}__s1"),
          count(vc).as(s"${c}__n2"), avg(vc).as(s"${c}__m2"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      def d(n: String): Double = row.getAs[Any](n) match {
        case null => Double.NaN
        case x: Number => x.doubleValue()
      }
      numericCols.map(c => c -> Sides(row.getAs[Long](s"${c}__n1"), d(s"${c}__m1"),
        d(s"${c}__s1"), row.getAs[Long](s"${c}__n2"), d(s"${c}__m2"))).toMap
    }

    // jobs 2-4: multi-column exact KS over columns populated on both sides
    val ksCols = numericCols.filter(c => sides(c).n1 > 0 && sides(c).n2 > 0)
    val ksByCol = if (ksCols.isEmpty) Map.empty[String, KsTest.KsResult]
      else KsTest.ks2SampMulti(df, ksCols, isBaseline)
    val ksDrift = ksCols.map { c =>
      val s = sides(c)
      val ks = ksByCol(c)
      ColumnDrift(c, "ks", ks.statistic, ks.pValue, ks.pValue < ksThreshold,
        meanDifference(s.m1, s.s1, s.m2), ks.n1, ks.n2)
    }

    // job 5: every categorical column's capped counts in one melted groupBy
    // ([[meltedCatCounts]])
    val catDrift: Seq[ColumnDrift] =
      meltedCatCounts(df, catCols, isBaseline, CatTopK).toSeq
        .sortBy { case (c, _) => catCols.indexOf(c) }
        .map { case (c, cnts) =>
          val ref = cnts.map(r => r._1 -> r._2).toMap
          val cur = cnts.map(r => r._1 -> r._3).toMap
          val (stat, p, _) = chiSqGof(ref, cur)
          // n_ref/n_cur are THIS column's non-null counts (the tail fold
          // preserves per-side sums), not the first numeric column's — a
          // cat-only detect() must not report sample sizes of 0
          ColumnDrift(c, "chisq", stat, p, p < ChiSqThreshold, 0.0,
            cnts.map(_._2).sum, cnts.map(_._3).sum)
        }

    val all = ksDrift ++ catDrift
    DriftReport(all.exists(_.drift_detected),
      all,
      (numericCols.map(c => sides(c).n2) ++ catDrift.map(_.n_cur))
        .maxOption.getOrElse(0L))
  }

  /** Chi-square goodness-of-fit from category count maps: expected =
    * baseline proportions × current covered total; categories absent from
    * the baseline excluded; dof = #baseline categories − 1.
    */
  /** Current-side total over baseline-covered categories — the chi-square
    * coverage denominator. ONE shared definition: Cramér's V normalizes by
    * this same quantity (Suite.chiSqFromCounts), so the two must not drift.
    * Iterates the KEYS as a sequence: mapping the key SET to counts would
    * collapse equal counts before the sum (latent bug — fired once many
    * categories shared a count, e.g. a uniform top-K from the capped path).
    */
  private[graft] def coveredCurTotal(ref: Map[String, Long], cur: Map[String, Long]): Double =
    ref.filter(_._2 > 0).keysIterator.map(cur.getOrElse(_, 0L)).sum.toDouble

  private[graft] def chiSqGof(ref: Map[String, Long], cur: Map[String, Long]): (Double, Double, Long) = {
    val base = ref.filter(_._2 > 0)
    val n1 = base.values.sum.toDouble
    val n2cov = coveredCurTotal(ref, cur)
    if (n1 == 0 || n2cov == 0 || base.size < 2) return (0.0, 1.0, 0L)
    val stat = base.map { case (k, c1) =>
      val exp = c1 / n1 * n2cov
      val obs = cur.getOrElse(k, 0L).toDouble
      (obs - exp) * (obs - exp) / exp
    }.sum
    (stat, DriftMath.chiSquarePValue(stat, base.size - 1L), base.size - 1L)
  }

  /** Sensor-pipeline batch analog (sensor.py:186-193): per group, the ratio
    * of "unusual" rows; drift iff ratio STRICTLY > threshold (0.10).
    */
  def unusualRatio(df: DataFrame, groupCol: String, isUnusual: Column,
                   threshold: Double = 0.10): DataFrame =
    df.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(when(isUnusual, 1L).otherwise(0L)).as("unusual_count"))
      .withColumn("ratio", col("unusual_count") / col("n"))
      .withColumn("drift_detected", col("ratio") > threshold)
}
