package graft.analytics

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[CounterRollup]]: slice → merge → serve must equal the direct
  * one-pass [[TimeSeries.counterIncrease]] for ANY disjoint slicing —
  * including cuts landing on a reset, and sample pairs that cross a
  * slice cut and an hour boundary at once. */
class CounterRollupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, Long, Double)*) = {
    import spark.implicits._
    rows.map { case (id, t, u, v) => (id, ts(t), u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private val fixture = ev(
    (1L, "2024-01-01 00:10:00", 9L, 100.00),
    (2L, "2024-01-01 00:20:00", 9L, 180.00),
    (3L, "2024-01-01 01:10:00", 9L, 30.00), // reset, right at a cut below
    (4L, "2024-01-01 01:20:00", 9L, 50.00),
    (5L, "2024-01-01 03:59:00", 9L, 90.00), // hour 3 …
    (6L, "2024-01-01 05:01:00", 9L, 95.00), // … to hour 5 across a cut
    (7L, "2024-01-01 00:15:00", 4L, 7.00))  // second user, single sample

  private def direct = TimeSeries.counterIncrease(fixture).collect()
    .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq

  private def sliced(cuts: String*) =
    CounterRollup.increaseFromSlices(fixture, cuts).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq

  test("single slice (no cuts) equals the direct operator") {
    assert(sliced() == direct)
  }

  test("cuts at a reset and between distant hours still stitch exactly") {
    assert(sliced("2024-01-01 01:10:00", "2024-01-01 04:30:00") == direct)
  }

  test("many thin slices (every 30 min) equal the direct operator") {
    val cuts = (0 until 12).map(i => f"2024-01-01 ${i / 2}%02d:${30 * (i % 2)}%02d:00")
    assert(sliced(cuts: _*) == direct)
  }

  test("upsertState: N micro-batch upserts serve the one-pass answer") {
    import org.apache.spark.sql.functions.col
    val table = "counter_state_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // replay the fixture as three event-time-ordered micro-batches
    val cuts = Seq(ts("2024-01-01 01:10:00"), ts("2024-01-01 03:00:00"))
    val batches = Seq(
      fixture.filter(col("ts") < cuts(0)),
      fixture.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      fixture.filter(col("ts") >= cuts(1)))
    batches.foreach(b => CounterRollup.upsertState(spark, table, b))
    val served = CounterRollup.serveIncrease(spark.table(table)).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq
    assert(served == direct)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("merge is n-way: three same-hour slices stitch both boundaries") {
    val d = ev(
      (1L, "2024-01-01 00:05:00", 1L, 10.00),
      (2L, "2024-01-01 00:15:00", 1L, 25.00),
      (3L, "2024-01-01 00:25:00", 1L, 5.00),  // reset inside the hour
      (4L, "2024-01-01 00:35:00", 1L, 8.00))
    val got = CounterRollup.increaseFromSlices(d,
      Seq("2024-01-01 00:10:00", "2024-01-01 00:20:00", "2024-01-01 00:30:00"))
      .collect().map(r => r.getLong(2)).toSeq
    assert(got == Seq(1000L + 1500L + 500L + 300L))
  }
}
