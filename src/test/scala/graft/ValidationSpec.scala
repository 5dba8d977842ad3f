package graft

import graft.gen.SensorEventGen
import graft.suite.{Alerts, Validation, Verdict}
import org.apache.spark.sql.functions._

class ValidationSpec extends GraftSpec {
  import spark.implicits._

  test("validation report: one-pass completeness + expectations + pinned score (DESIGN.md §3.3)") {
    val df = Seq(
      ("s1", "traffic", "2025-01-01T00:00:00Z", Some(100.0)),
      ("s2", "traffic", "", Some(600.0)),           // missing ts + range failure
      ("", "environment", "2025-01-01T00:00:01Z", Some(25.0)),  // missing id
      ("s4", "environment", "2025-01-01T00:00:02Z", None)       // null value
    ).toDF("sensor_id", "type", "timestamp", "value")
    val exps = Seq(
      Validation.RangeExpectation("traffic_range", col("type") === "traffic", "value", 0, 500),
      Validation.RangeExpectation("temp_range", col("type") === "environment", "value", -20, 50))
    val r = Validation.validate(df, Seq("sensor_id", "timestamp", "value"), exps)
    assert(r.totalRecords == 4)
    assert(r.missingCounts == Map("sensor_id" -> 1L, "timestamp" -> 1L, "value" -> 1L))
    assert(r.errorRates("sensor_id") == 0.25)
    assert(r.expectationResults("traffic_range") == ((1L, 2L)))
    // null value under the env condition counts as a failure (GE unexpected)
    assert(r.expectationResults("temp_range") == ((1L, 2L)))
    assert(r.overallQualityScore == 0.0) // gated: an expectation failed
  }

  test("quality score = 1 - max(error rate) when all expectations pass") {
    val df = Seq(
      ("s1", "traffic", "t", Some(100.0)), ("s2", "traffic", "t", Some(200.0)),
      ("", "traffic", "t", Some(300.0)), ("s4", "traffic", "t", Some(400.0))
    ).toDF("sensor_id", "type", "timestamp", "value")
    val r = Validation.validate(df, Seq("sensor_id", "timestamp"),
      Seq(Validation.RangeExpectation("ok", col("type") === "traffic", "value", 0, 500)))
    assert(r.overallQualityScore == 0.75)
  }

  test("sensor defaults hold on the clean generated stream") {
    val events = SensorEventGen.generate(spark, 5000, unusualProb = 0.0)
    val r = Validation.validate(events, Seq("sensor_id", "timestamp", "zip"),
      Validation.sensorExpectations)
    assert(r.overallQualityScore == 1.0)
    assert(r.expectationResults.values.forall(_._1 == 0))
  }

  test("alert rules fire via broadcast rule join (DESIGN.md:689-747)") {
    val verdicts = Seq(
      Verdict(1, "drift_ks", "len", 0.4, 0.001, 0.05, passed = false, 0),
      Verdict(1, "drift_psi", "len", 0.35, Double.NaN, 0.2, passed = false, 0),
      Verdict(1, "quality_score", "*", 0.95, Double.NaN, 0, passed = true, 0),
      Verdict(2, "drift_ks", "len", 0.01, 0.9, 0.05, passed = true, 0)
    ).toDF()
    val alerts = Alerts.evaluate(verdicts).collect()
    val keys = alerts.map(a => (a.getAs[Long]("batch_id"), a.getAs[String]("check"))).toSet
    assert(keys.contains((1L, "drift_ks")))   // p 0.001 < 0.05
    assert(keys.contains((1L, "drift_psi")))  // 0.35 > 0.2
    assert(!keys.contains((2L, "drift_ks")))  // p 0.9 not < 0.05
    assert(!keys.exists(_._2 == "quality_score")) // 0.95 not < 0.8
    val sev = alerts.map(a => a.getAs[String]("check") -> a.getAs[String]("severity")).toMap
    assert(sev("drift_ks") == "critical")
  }
}
