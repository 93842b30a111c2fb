package graft

import java.sql.Timestamp

import graft.ops.EventAnalytics

/** Hand-computed fixtures for the event-analytics operators; the oracle
  * gates (st3/st4/st5) check them against DuckDB at sf0.01 — these specs
  * pin the SEMANTICS on cases small enough to verify by eye: island
  * splits, strict funnel ordering, cohort offsets.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, typ) => (u, ts(t), typ) }
      .toDF("user_id", "ts", "event_type")

  test("activityIslands splits on gaps and merges consecutive days") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 23:00:00", "view"), // same day, deduped
      (1L, "2024-01-02 01:00:00", "view"), // consecutive → same island
      (1L, "2024-01-05 12:00:00", "view"), // gap → new island
      (2L, "2024-01-03 00:00:00", "view")) // other user independent
    val got = EventAnalytics.activityIslands(df)
      .as[(Long, Long, Long, Long)].collect().toSet
    val d = 19723L // epoch day of 2024-01-01
    assert(got == Set(
      (1L, d, d + 1, 2L),
      (1L, d + 4, d + 4, 1L),
      (2L, d + 2, d + 2, 1L)))
  }

  test("funnel requires strictly increasing stage timestamps") {
    val df = ev(
      // u1 completes the funnel in order
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // u2 clicked BEFORE viewing → click must not count
      (2L, "2024-01-01 09:00:00", "click"),
      (2L, "2024-01-01 10:00:00", "view"),
      // u3 viewed and purchased but never clicked → purchase blocked
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 11:00:00", "purchase"),
      // u4 never viewed
      (4L, "2024-01-01 10:00:00", "click"))
    val row = EventAnalytics
      .funnel(df, Seq("view", "click", "purchase")).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (3L, 1L, 1L))
  }

  test("funnel counts a later same-stage event when the first is too early") {
    val df = ev(
      (1L, "2024-01-01 09:00:00", "click"), // too early
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click")) // valid second click
    val row = EventAnalytics.funnel(df, Seq("view", "click")).head()
    assert((row.getLong(0), row.getLong(1)) == (1L, 1L))
  }

  test("funnelWindowed anchors at ANY stage-1 event, not just the first") {
    val hourUs = 3600L * 1000000L
    val df = ev(
      // u1: first view's chain is too slow (3 h) but the SECOND view
      // anchors a chain that completes in 1.5 h
      (1L, "2024-01-01 09:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"),
      (1L, "2024-01-01 11:30:00", "purchase"),
      // u2: completes but in 4 h — only view+click inside the horizon
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-01 13:00:00", "purchase"),
      // u3: click before any view — never enters the funnel chain
      (3L, "2024-01-01 09:00:00", "click"),
      (3L, "2024-01-01 10:00:00", "view"))
    val row = EventAnalytics
      .funnelWindowed(df, Seq("view", "click", "purchase"), 2L * hourUs)
      .head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (3L, 2L, 1L))
  }

  test("funnelWindowed picks the best anchor per completing event") {
    val hourUs = 3600L * 1000000L
    // the purchase is within 1 h of the LATE view's chain only; the
    // max-anchor recursion must carry the 10:00 view through the 10:30
    // click, not the 08:00 one
    val df = ev(
      (1L, "2024-01-01 08:00:00", "view"),
      (1L, "2024-01-01 08:10:00", "click"),
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"),
      (1L, "2024-01-01 10:55:00", "purchase"))
    val row = EventAnalytics
      .funnelWindowed(df, Seq("view", "click", "purchase"), hourUs)
      .head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (1L, 1L, 1L))
  }

  test("forwardFillDaily carries the last end-of-day value across gaps") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0, 1L),
      (1L, ts("2024-01-01 22:00:00"), 7.0, 2L),  // later same day wins
      (1L, ts("2024-01-04 01:00:00"), 9.0, 3L),  // two gap days filled with 7
      (2L, ts("2024-01-02 00:00:00"), 1.0, 4L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = graft.ops.EventAnalytics.forwardFillDaily(df)
      .as[(Long, Long, Long)].collect().toSet
    val d = 19723L
    assert(got == Set(
      (1L, d, 700L), (1L, d + 1, 700L), (1L, d + 2, 700L), (1L, d + 3, 900L),
      (2L, d + 1, 100L)))
  }

  test("interpolateDaily: gap days take the exact integer-floored line " +
      "between neighbors; observed days keep their value") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 1L), // day d: 100 cents
      (1L, ts("2024-01-04 01:00:00"), 4.0, 2L), // day d+3: 400
      (2L, ts("2024-01-01 00:00:00"), 1.0, 3L), // negative slope user
      (2L, ts("2024-01-04 00:00:00"), 0.0, 4L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = graft.ops.EventAnalytics.interpolateDaily(df)
      .as[(Long, Long, Long)].collect().toSet
    val d = 19723L
    assert(got == Set(
      (1L, d, 100L), (1L, d + 1, 200L), (1L, d + 2, 300L), (1L, d + 3, 400L),
      // 100 → 0 over 3 days, floored: 100+floor(-100/3)=66,
      // 100+floor(-200/3)=33
      (2L, d, 100L), (2L, d + 1, 66L), (2L, d + 2, 33L), (2L, d + 3, 0L)),
      got)
  }

  test("weeklyRetention offsets are relative to each user's first week") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "view"), // u1 cohort week w
      (1L, "2024-01-08 00:00:00", "view"), // w+1
      (1L, "2024-01-22 00:00:00", "view"), // w+3
      (2L, "2024-01-08 00:00:00", "view"), // u2 cohort week w+1
      (2L, "2024-01-15 00:00:00", "view")) // w+2 → offset 1
    val got = EventAnalytics.weeklyRetention(df)
      .as[(Long, Long, Long)].collect().toSet
    val w = 2817L // epoch week of 2024-01-01 (unix 1704067200 / 604800)
    assert(got == Set(
      (w, 0L, 1L), (w, 1L, 1L), (w, 3L, 1L),
      (w + 1, 0L, 1L), (w + 1, 1L, 1L)))
  }
}
