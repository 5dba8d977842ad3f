package graft

import graft.streaming.Sessionize
import graft.drift.GroupDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Laws for sessionization and novel-category detection. */
class SessionizeSpec extends GraftSpec {
  import spark.implicits._

  private def ev(rows: (String, String)*) =
    rows.toSeq.toDF("u", "t").select(col("u"), to_timestamp(col("t")).as("ts"))

  test("strict-gap rule: exact gap continues the session, beyond it breaks") {
    val df = ev(
      ("a", "2024-01-01 00:00:00"),
      ("a", "2024-01-01 01:00:00"),   // gap exactly 3600 → same session
      ("a", "2024-01-01 02:00:01"),   // gap 3601 → new session
      ("a", "2024-01-01 02:30:00"))
    val idx = Sessionize.sessionize(df, "u", "ts", 3600.0)
      .orderBy("ts").select("session_index").as[Long].collect().toSeq
    assert(idx === Seq(0L, 0L, 1L, 1L))
  }

  test("sub-second gaps resolve at microsecond precision, never floored") {
    val df = ev(
      ("a", "2024-01-01 00:00:00.0"),
      ("a", "2024-01-01 00:00:01.5"),  // gap 1.5 s > 1.0 → break
      ("a", "2024-01-01 00:00:02.4"))  // gap 0.9 s → continue
    val idx = Sessionize.sessionize(df, "u", "ts", 1.0)
      .orderBy("ts").select("session_index").as[Long].collect().toSeq
    assert(idx === Seq(0L, 1L, 1L))
  }

  test("keys sessionize independently; result is partitioning-invariant") {
    val df = ev(
      ("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 00:00:00"),
      ("a", "2024-01-01 09:00:00"), ("b", "2024-01-01 00:30:00"))
    val base = Sessionize.sessionize(df, "u", "ts", 3600.0)
      .orderBy("u", "ts").collect().toSeq
    val reparted = Sessionize.sessionize(df.repartition(7), "u", "ts", 3600.0)
      .orderBy("u", "ts").collect().toSeq
    assert(base === reparted)
    val byKey = base.map(r => (r.getString(0), r.getLong(2)))
    assert(byKey === Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 0L)))
  }

  test("parity with Spark's built-in session_window away from exact-gap boundaries") {
    // 40 events across 2 users with gaps of 600 s or 7200 s — never exactly
    // the 3600 s gap, so both semantics agree on every break
    val rows = for (u <- Seq("a", "b"); i <- 0 until 20) yield {
      val off = (0 until i).map(j => if (j % 5 == 4) 7200L else 600L).sum
      (u, new java.sql.Timestamp(1704067200000L + off * 1000L +
        (if (u == "b") 43L * 86400000L else 0L)))
    }
    val df = rows.toDF("u", "ts")
    val ours = Sessionize.sessionize(df, "u", "ts", 3600.0)
      .groupBy("u", "session_index").count()
      .orderBy("u", "session_index").select("count").as[Long].collect().toSeq
    val builtin = df.groupBy(col("u"), session_window(col("ts"), "3600 seconds"))
      .count().orderBy(col("u"), col("session_window.start"))
      .select("count").as[Long].collect().toSeq
    assert(ours === builtin)
  }

  test("exact-gap boundary agrees with session_window: both merge") {
    // gap EXACTLY 3600 s: our strict-> rule continues the session, and
    // Spark's session_window also merges an event landing exactly on the
    // window end — the two semantics coincide even at the boundary
    val df = ev(("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 01:00:00"))
    val ourSessions = Sessionize.sessionize(df, "u", "ts", 3600.0)
      .select(max("session_index")).as[Long].collect().head + 1
    val builtinSessions = df
      .groupBy(session_window(col("ts"), "3600 seconds")).count().count()
    assert(ourSessions === 1L && builtinSessions === 1L)
  }

  test("streaming session_window with watermark equals batch Sessionize on the closed set") {
    // the deploy form: events arrive as a stream, sessions close when the
    // watermark passes their gap; on a CLOSED input drained to completion
    // the emitted session rows must equal the batch rollup (T3 principle)
    import org.apache.spark.sql.streaming.OutputMode
    val rows = for (i <- 0 until 30) yield {
      val off = (0 until i).map(j => if (j % 7 == 6) 7200L else 300L).sum
      ("u" + i % 2, new java.sql.Timestamp(1704067200000L + off * 1000L))
    }
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val streamed = mem.toDF().toDF("u", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("u"), session_window(col("ts"), "3600 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("u"), col("n_events"))
    val q = streamed.writeStream.format("memory")
      .queryName("sess_stream").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // a final far-future event pushes the watermark past every session
      mem.addData(("zz", new java.sql.Timestamp(1704067200000L + 10L * 86400000L)))
      q.processAllAvailable()
    } finally q.stop()
    val streamedCounts = spark.table("sess_stream")
      .where(col("u") =!= "zz")
      .orderBy("u", "n_events").select("u", "n_events").collect().toSeq
    val batch = Sessionize.sessionize(rows.toDF("u", "ts"), "u", "ts", 3600.0)
      .groupBy("u", "session_index").agg(count(lit(1)).as("n_events"))
      .orderBy("u", "n_events").select("u", "n_events").collect().toSeq
    assert(streamedCounts === batch)
  }

  test("novel categories: only never-in-baseline values, minCount cuts the tail") {
    val df = Seq(
      ("en", true), ("en", false), ("de", true),
      ("xx", false), ("xx", false), ("yy", false)
    ).toDF("lang", "b")
    val all = GroupDrift.novelCategories(df, "lang", col("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all === Map("xx" -> 2L, "yy" -> 1L))   // en/de seen in baseline
    val cut = GroupDrift.novelCategories(df, "lang", col("b"), minCount = 2)
      .collect().map(_.getString(0)).toSeq
    assert(cut === Seq("xx"))
  }

  test("novel categories: null values and null conditions excluded") {
    val df = Seq(
      (Some("en"), Some(true)), (Some("zz"), Some(false)),
      (None, Some(false)),                    // null value → not a category
      (Some("qq"), None)                      // null condition → neither side
    ).toDF("lang", "b")
    val out = GroupDrift.novelCategories(df, "lang", col("b"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("zz"))
  }
}
