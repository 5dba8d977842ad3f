package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-analytics operator
  * (Structured Streaming's `session_window` is the streaming form of the
  * same semantics; this is the batch/backfill form that validation and
  * training pipelines run over closed event sets).
  *
  * Semantics pinned: events are time-ordered WITHIN each key; a new
  * session starts when the gap since the previous event strictly EXCEEDS
  * `gapSec` (an exact-gap event continues the session — which is ALSO
  * what `session_window` does: parity and the boundary case are both
  * spec-asserted against the built-in). Gaps are measured
  * in fractional epoch seconds (microsecond precision — never
  * whole-second floors, which would merge sub-second bursts across a
  * boundary). `session_index` is 0-based per key. Rows with equal
  * timestamps order arbitrarily within the tie, but the OUTPUT is
  * tie-order-invariant: intra-tie gaps are 0, so every order yields the
  * same break set and the same cumulative index.
  *
  * Scale: ONE shuffle (partition by key); both windows partition by the
  * key, so key cardinality is the parallelism and no global ordering
  * exists anywhere. A single key with 10^9 events lands in one task — the
  * standard sessionization skew; salt by coarse time bucket upstream if a
  * key can realistically hold a reducer's worth of events.
  */
object Sessionize {

  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSec: Double): DataFrame = {
    require(gapSec > 0, s"gap must be positive, got $gapSec")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val cum = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // micros/1e6 (not a double cast — NTZ won't cast, and this is exactly
    // DuckDB's epoch(): same integer, same divisor, same double); the NTZ →
    // LTZ cast is the identity under the pinned UTC session timezone
    val sec = unix_micros(col(tsCol).cast("timestamp")).cast("double") / 1e6
    df.withColumn("_prev", lag(sec, 1).over(w))
      .withColumn("_brk",
        when(col("_prev").isNull || sec - col("_prev") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_index", sum("_brk").over(cum) - 1L)
      .drop("_prev", "_brk")
  }
}
