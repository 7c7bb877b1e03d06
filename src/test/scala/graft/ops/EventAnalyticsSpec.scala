package graft.ops

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("tableStats counts rows, nulls, and distincts per column in one pass") {
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(1L), None),
      (Some(2L), Some("b")),
      (None, Some("b"))
    ).toDF("k", "v")
    val out = Analyze.tableStats(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "k" -> ((4L, 1L, 2L)), // 4 rows, 1 null, distinct {1, 2}
      "v" -> ((4L, 1L, 2L)))) // distinct {a, b}, null excluded
  }

  test("tableStats emits exactly one row per column, sorted, on a real table") {
    val out = Analyze.q101TableStats(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey"))
    // key column: no nulls, all distinct
    val key = out.find(_.getString(0) == "c_custkey").get
    assert(key.getLong(2) == 0L && key.getLong(3) == key.getLong(1))
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel steps require order and the 24h window") {
    // u1 converts fully; u2's click is 25h after first view (out of
    // window); u3's click precedes every view (wrong order); u4's
    // purchase is in-window of its click
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 05:00:00")),
      (1L, "purchase", ts("2024-01-01 06:00:00")),
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-02 01:00:00")),
      (3L, "click", ts("2024-01-01 00:00:00")),
      (3L, "view", ts("2024-01-01 01:00:00")),
      (4L, "view", ts("2024-01-01 00:00:00")),
      (4L, "click", ts("2024-01-01 23:00:00")),
      (4L, "purchase", ts("2024-01-02 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    // drive the same step logic via a temp view of the q102 shape
    val dir = java.nio.file.Files.createTempDirectory("graftfunnel").toString
    ev.withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.q102Funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // views: u1 u2 u4 (u3's view exists too → 4); clicks in-window and
    // ordered: u1 (5h), u4 (23h) — u2 out of window, u3 wrong order;
    // purchases: u1 (1h after click), u4 (11h after click)
    assert(out.toSeq == Seq((1L, 4L), (2L, 2L), (3L, 2L)))
  }

  test("retention cohorts count distinct active users per week offset") {
    val ev = Seq(
      // u1 signs up week of Jan 1 (Mon), active weeks 0 and 2
      (1L, "signup", ts("2024-01-02 10:00:00")),
      (1L, "click", ts("2024-01-03 10:00:00")),
      (1L, "click", ts("2024-01-16 10:00:00")),
      // u2 same cohort, active week 0 only (signup itself counts)
      (2L, "signup", ts("2024-01-04 10:00:00")),
      // u3 next week's cohort, active weeks 0 and 1
      (3L, "signup", ts("2024-01-09 10:00:00")),
      (3L, "view", ts("2024-01-15 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graftret").toString
    ev.withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.q103Retention(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("last-touch attribution: lookback window, direct fallback, purchase never a touch") {
    val ev = Seq(
      // u1: click 30 min before -> credited to click
      (1L, 10L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (1L, 11L, ts("2024-01-01 10:30:00"), "purchase", 5.0),
      // u1 again: a SECOND purchase right after the first — the prior
      // purchase is not a touch; the click (90 min back) is stale ->
      // direct
      (1L, 12L, ts("2024-01-01 11:30:00"), "purchase", 7.0),
      // u2: view then click then purchase — the NEAREST touch (click)
      // wins over the earlier view
      (2L, 20L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (2L, 21L, ts("2024-01-01 09:40:00"), "click", 0.0),
      (2L, 22L, ts("2024-01-01 10:00:00"), "purchase", 11.0),
      // u3: purchase with no prior events at all -> direct
      (3L, 30L, ts("2024-01-01 10:00:00"), "purchase", 3.0),
      // u4: touch exactly 1 hour before (boundary is inclusive)
      (4L, 40L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (4L, 41L, ts("2024-01-01 10:00:00"), "purchase", 2.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = EventOps.attributeLastTouch(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("click", 2L, 1600L),  // u1 first purchase (500) + u2 (1100)
      ("direct", 2L, 1000L), // u1 second (stale, 700) + u3 (no touch, 300)
      ("view", 1L, 200L)))   // u4: boundary-inclusive 1 h lookback
  }

  test("q138 first-touch/linear: range frame, equal split quantization, same-ts peers") {
    val ev = Seq(
      // u1: one touch 30 min back; then a second purchase whose
      // window holds NO touch (the 10:00 click is 90 min stale)
      (1L, 10L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (1L, 11L, ts("2024-01-01 10:30:00"), "purchase", 5.0),
      (1L, 12L, ts("2024-01-01 11:30:00"), "purchase", 7.0),
      // u2: view (exactly 1 h back, boundary inclusive) then click —
      // FIRST touch is the view; linear splits 1100 cents in half
      (2L, 20L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (2L, 21L, ts("2024-01-01 09:40:00"), "click", 0.0),
      (2L, 22L, ts("2024-01-01 10:00:00"), "purchase", 11.0),
      // u3: no prior events at all -> direct in both models
      (3L, 30L, ts("2024-01-01 10:00:00"), "purchase", 3.0),
      // u4: single touch at the exact window edge
      (4L, 40L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (4L, 41L, ts("2024-01-01 10:00:00"), "purchase", 2.0),
      // u5: touch at the SAME timestamp as the purchase — RANGE /
      // CURRENT ROW includes timestamp peers in both engines
      (5L, 50L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (5L, 51L, ts("2024-01-01 10:00:00"), "purchase", 4.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = EventOps.attributeMultiTouch(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      ("first_touch", "click", 1L, 500000000L),   // u1 p1
      ("first_touch", "direct", 2L, 1000000000L), // u1 p2 + u3
      ("first_touch", "view", 3L, 1700000000L),   // u2 (1100) + u4 (200) + u5 (400)
      ("linear", "click", 2L, 1050000000L),  // u1 p1 full + u2 half (550)
      ("linear", "direct", 2L, 1000000000L), // u1 p2 + u3
      ("linear", "view", 3L, 1150000000L)),  // u2 half + u4 + u5
      s"got $out")
  }
}
