package graft

import graft.suite.Monitoring
import org.apache.spark.sql.functions._

/** Laws for the freshness metric: the watermark-holding group is always
  * fresh with staleness 0, staleness equals a driver-side recompute, and
  * the result is partitioning-invariant (closed-set determinism).
  */
class MonitoringSpec extends GraftSpec {
  import spark.implicits._

  private lazy val events = Seq(
    ("a", "2024-01-10 00:00:00"), ("a", "2024-01-15 12:00:00"),
    ("b", "2024-01-14 11:59:30"), ("b", "2024-01-01 00:00:00"),
    ("c", "2024-01-02 08:00:00")
  ).toDF("event_type", "s").select(col("event_type"),
    to_timestamp(col("s")).as("ts"))

  test("watermark group is fresh with staleness 0; thresholds cut correctly") {
    val f = Monitoring.freshness(events, "ts", Seq("event_type"), 86400L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("staleness_sec"), r.getAs[Boolean]("fresh"))).toMap
    assert(f("a") == (0L, true))                 // holds the max ts
    assert(f("b") == (86430L, false))            // 1 day + 30 s stale
    assert(f("c") == (1137600L, false))          // 13.17 days stale
    // a looser threshold flips b but not c
    val loose = Monitoring.freshness(events, "ts", Seq("event_type"), 90000L)
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("fresh")).toMap
    assert(loose("b") && !loose("c"))
  }

  test("partitioning invariance (closed-set determinism)") {
    val base = Monitoring.freshness(events, "ts", Seq("event_type"), 86400L)
      .orderBy("event_type").collect().toSeq
    val reparted = Monitoring.freshness(events.repartition(7), "ts",
      Seq("event_type"), 86400L).orderBy("event_type").collect().toSeq
    assert(base == reparted)
  }
}
