package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Unit coverage for the reshaping/time-profile tranche (the oracle gate
  * exercises these at one data shape; these specs pin the edge semantics). */
class Analytics3Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, "click", 10.0),
      (2L, ts("2024-01-01 00:40:00"), 1L, "click", 20.0),
      (3L, ts("2024-01-01 01:10:00"), 2L, "purchase", 30.0),
      (4L, ts("2024-01-02 23:59:59"), 2L, "view", 40.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("dailyTypePivot emits one column per requested type, zero-filled") {
    val out = Analytics3.dailyTypePivot(events, Seq("click", "purchase", "view", "error"))
    assert(out.columns.toSeq == Seq("day", "click", "purchase", "view", "error"))
    val rows = out.collect()
    assert(rows.length == 2)
    val d1 = rows(0)
    assert(d1.getAs[Long]("click") == 2 && d1.getAs[Long]("purchase") == 1
      && d1.getAs[Long]("error") == 0)
  }

  test("hourlyProfile buckets by hour of day across days") {
    val out = Analytics3.hourlyProfile(events).collect()
    // hour 0: 2 clicks; hour 1: 1 purchase; hour 23: 1 view
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((0L, "click", 2L), (1L, "purchase", 1L), (23L, "view", 1L)))
  }

  test("slidingCounts lands every event in exactly two 1h/30min windows") {
    val out = Analytics3.slidingCounts(events)
    assert(out.agg(sum("n")).collect().head.getLong(0) == events.count() * 2)
    // slide-aligned: event at 00:10 belongs to windows starting 23:30 and 00:00
    val w = out.filter(col("event_type") === "click").collect()
      .map(r => r.getTimestamp(0).toString).toSeq
    assert(w.contains("2023-12-31 23:30:00.0") && w.contains("2024-01-01 00:00:00.0"))
  }

  test("latestEventPerUser breaks ts ties by event_id") {
    import spark.implicits._
    val tied = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "a", 1.0),
      (2L, ts("2024-01-01 00:00:00"), 7L, "b", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics3.latestEventPerUser(tied).collect()
    assert(out.length == 1 && out.head.getAs[Long]("event_id") == 2L)
  }

  test("sessionWindows splits on gap strictly greater than the threshold") {
    import spark.implicits._
    // 30-min gap: events 30:00 apart stay in one session (> not >=)
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (2L, ts("2024-01-01 00:30:00"), 1L),
      (3L, ts("2024-01-01 01:00:01"), 1L) // 30:01 after #2 → new session
    ).toDF("event_id", "ts", "user_id")
    val out = Analytics3.sessionWindows(rows, 30).collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("n_events") == 2)
  }
}
