package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov test, distributed.
  *
  * Reference semantics (DESIGN.md:559-568): `ks_2samp(ref.dropna(),
  * cur.dropna())`; drift iff p < threshold (default 0.05, DESIGN.md:534).
  *
  * Exact path: D = max over the pooled distinct values of |F_ref − F_cur|.
  * We first `groupBy(value)` (one shuffle that also collapses duplicates —
  * content lengths / measurements have far fewer DISTINCT values than rows),
  * then take running sums over the distinct values. The running sum is a
  * single-partition window over #distinct rows — fine up to ~10^7 distinct;
  * beyond that use [[ksStatisticSketched]] (t-digest CDFs on a quantile
  * grid), which is fully mergeable and scale-free.
  */
object KsTest {

  case class KsResult(statistic: Double, pValue: Double, n1: Long, n2: Long) {
    def drift(threshold: Double = 0.05): Boolean = pValue < threshold
  }

  /** Exact two-sample KS statistic. `isBaseline` tags side 1.
    * Nulls/NaNs dropped on both sides (reference dropna()).
    */
  def ks2Samp(df: DataFrame, valueCol: String, isBaseline: Column): KsResult = {
    val v = col(valueCol).cast("double")
    val clean = df.where(v.isNotNull && !isnan(v))
      .select(v.as("v"), when(isBaseline, 1L).otherwise(0L).as("s1"),
        when(isBaseline, 0L).otherwise(1L).as("s2"))
    val counts = clean.groupBy("v")
      .agg(sum("s1").as("c1"), sum("s2").as("c2"))
    // One job: running ECDF counts + grand totals in the same window stage;
    // D = max|cum1*n2 − cum2*n1| / (n1*n2) avoids needing totals up front.
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val r = counts
      .withColumn("cum1", sum("c1").over(w).cast("double"))
      .withColumn("cum2", sum("c2").over(w).cast("double"))
      .withColumn("n1", sum("c1").over(wAll))
      .withColumn("n2", sum("c2").over(wAll))
      .agg(
        max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("num"),
        max("n1").as("n1"), max("n2").as("n2"))
      .collect()
    if (r.isEmpty || r(0).isNullAt(1) || r(0).isNullAt(2)) return KsResult(0.0, 1.0, 0, 0)
    val n1 = r(0).getAs[Long]("n1")
    val n2 = r(0).getAs[Long]("n2")
    if (n1 == 0 || n2 == 0) return KsResult(0.0, 1.0, n1, n2)
    val d = r(0).getAs[Double]("num") / (n1.toDouble * n2.toDouble)
    KsResult(d, DriftMath.ksPValue(d, n1, n2), n1, n2)
  }

  /** Scale path: approximate KS from two mergeable t-digest sketches —
    * evaluate both CDFs on a grid of candidate points (the union of both
    * digests' quantiles at `grid` ranks) and take the max gap. Error is
    * bounded by digest accuracy; suitable when distinct-value cardinality
    * makes the exact path's final window too large.
    */
  def ksStatisticSketched(
      dig1: org.apache.datasketches.tdigest.TDigestDouble,
      dig2: org.apache.datasketches.tdigest.TDigestDouble,
      grid: Int = 200): KsResult = {
    if (dig1.isEmpty || dig2.isEmpty)
      return KsResult(0.0, 1.0, if (dig1.isEmpty) 0 else dig1.getTotalWeight,
        if (dig2.isEmpty) 0 else dig2.getTotalWeight)
    val qs = (0 to grid).map(_.toDouble / grid)
    val pts = (qs.map(dig1.getQuantile) ++ qs.map(dig2.getQuantile)).distinct.sorted
    val d = pts.map(x => math.abs(dig1.getRank(x) - dig2.getRank(x))).max
    val (n1, n2) = (dig1.getTotalWeight, dig2.getTotalWeight)
    KsResult(d, DriftMath.ksPValue(d, n1, n2), n1, n2)
  }
}
