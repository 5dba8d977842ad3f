package graft.suite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-monitoring metrics (reference DESIGN.md:598-602: volume, schema
  * violations, quality scores, freshness/timeliness). Quality is a suite
  * verdict row and schema violations are the [[SchemaCheck]] verdict; this
  * module adds the other two as standalone operators — freshness (per-group
  * staleness vs the dataset watermark) and the volume ANOMALY check (the
  * lineage rows record per-batch counts but render no verdict).
  */
object Monitoring {

  /** Volume-anomaly check (DESIGN.md:598 "volume" — the last monitoring
    * metric without a pass/fail form; the suite's lineage rows record
    * counts but render no verdict): each batch's row count z-scored
    * against the TRAILING `trailing` batches' mean/std.
    *
    * Semantics pinned: a batch with fewer than `trailing` predecessors
    * has insufficient history — `z` is NULL and the flag false (never
    * judge against a window the operator hasn't seen in full); a zero or
    * undefined trailing std likewise yields NULL z (a constant history
    * makes any deviation infinite-z — flagging there is a policy choice,
    * not statistics, so it is left to the caller's threshold on `n`).
    *
    * Scale note: the input is BATCH-LEVEL metadata (one row per committed
    * batch/day — thousands of rows at years of history), so the single
    * ordered window here is metadata-scale by construction, the same
    * size-class argument as the pre-flight schema gate; the engine-wide
    * "no partition-less window" rule targets row-scale data.
    */
  def volumeAnomaly(counts: DataFrame, orderCol: String, countCol: String,
                    trailing: Int = 7, zThreshold: Double = 3.0): DataFrame = {
    require(trailing >= 2, s"trailing window must be >= 2, got $trailing")
    val w = Window.orderBy(col(orderCol)).rowsBetween(-trailing, -1)
    counts
      .select(col(orderCol), col(countCol).cast("double").as("n"))
      .withColumn("hist_n", count(col("n")).over(w))
      .withColumn("hist_mean", avg(col("n")).over(w))
      .withColumn("hist_std", stddev_samp(col("n")).over(w))
      .withColumn("z", when(col("hist_n") >= trailing && col("hist_std") > 0,
        (col("n") - col("hist_mean")) / col("hist_std")))
      .withColumn("volume_anomaly", coalesce(abs(col("z")) > zThreshold, lit(false)))
      .drop("hist_n")
  }

  /** Freshness/timeliness per group (DESIGN.md:602): how stale is each
    * group's most recent event relative to the dataset watermark?
    *
    * The reference time is the GLOBAL max timestamp, not the wall clock —
    * a closed batch must produce the same verdict on every run (the T3
    * closed-set principle), and at deploy the caller passes the stream's
    * watermark through unchanged semantics. Staleness is compared in
    * whole epoch seconds (floor on both sides, so an external recompute
    * over the same parquet agrees bit-for-bit).
    *
    * Shape at scale: one map-side-combined max aggregate per group plus a
    * broadcast of the single-row watermark — no shuffle wider than the
    * group-key count, no window, nothing driver-side.
    */
  def freshness(df: DataFrame, tsCol: String, groupCols: Seq[String],
                thresholdSec: Long): DataFrame = {
    // watermark = max over the per-group maxima — derived from the SAME
    // grouped aggregate both branches share (identical subtree → Spark
    // reuses one exchange, so the input is scanned once; the previous
    // df.agg(max(ts)) form paid a second full scan of the timestamp
    // column just for the watermark)
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(max(col(tsCol)).as("last_seen"))
    val wm = grouped.agg(max(col("last_seen")).as("_watermark"))
    grouped
      .crossJoin(broadcast(wm))
      .select(groupCols.map(col) ++ Seq(
        col("last_seen"),
        (unix_timestamp(col("_watermark")) - unix_timestamp(col("last_seen")))
          .as("staleness_sec"),
        (unix_timestamp(col("_watermark")) - unix_timestamp(col("last_seen"))
          <= thresholdSec).as("fresh")): _*)
  }
}
