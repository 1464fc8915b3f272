package graft.analytics

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[TimeSeries]] kernels against hand-computed fixtures: deltaSum ignores
  * dips, increase() survives counter resets, the interval sweep counts
  * overlap once, and the decay weights are exact powers of two. */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** (event_id, ts, user_id, value) rows with the events schema. */
  private def ev(rows: (Long, String, Long, Double)*) = {
    import spark.implicits._
    rows.map { case (id, t, u, v) => (id, ts(t), u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("deltaSum sums only positive deltas (10→15→12→20 = 5+8)") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 7L, 10.00),
      (2L, "2024-01-01 00:01:00", 7L, 15.00),
      (3L, "2024-01-01 00:02:00", 7L, 12.00),
      (4L, "2024-01-01 00:03:00", 7L, 20.00))
    val r = TimeSeries.deltaSum(d).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("delta_sum_cents") == 1300L) // (15-10)+(20-12) in cents
    assert(r(0).getAs[Long]("n_samples") == 4L)
  }

  test("deltaSum keys per user; a single sample contributes zero") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, 50.00),
      (2L, "2024-01-01 00:00:00", 2L, 10.00),
      (3L, "2024-01-01 00:05:00", 2L, 11.00))
    val r = TimeSeries.deltaSum(d).collect().map(x =>
      x.getAs[Long]("user_id") -> x.getAs[Long]("delta_sum_cents")).toMap
    assert(r == Map(1L -> 0L, 2L -> 100L))
  }

  test("counterIncrease treats a drop as a reset restarting from zero") {
    // 100 → 180 → 30 (reset) → 50: first sample contributes 100 (came into
    // view), then +80, then +30 (post-reset value), then +20.
    val d = ev(
      (1L, "2024-01-01 00:10:00", 9L, 100.00),
      (2L, "2024-01-01 00:20:00", 9L, 180.00),
      (3L, "2024-01-01 01:10:00", 9L, 30.00),
      (4L, "2024-01-01 01:20:00", 9L, 50.00))
    val r = TimeSeries.counterIncrease(d).collect()
      .map(x => x.getAs[Timestamp]("hr") -> x.getAs[Long]("increase_cents")).toMap
    assert(r == Map(
      ts("2024-01-01 00:00:00") -> 18000L, // 100·100 + 80·100
      ts("2024-01-01 01:00:00") -> 5000L)) // 30·100 + 20·100
  }

  test("intervalUnionSeconds merges overlap and keeps gaps apart") {
    // [0,60) ∪ [30,90) ∪ [200,260) per the same user = 90 + 60 = 150 s.
    val d = ev(
      (1L, "2024-01-01 00:00:00", 3L, 60.0),
      (2L, "2024-01-01 00:00:30", 3L, 60.0),
      (3L, "2024-01-01 00:03:20", 3L, 60.0))
    val r = TimeSeries.intervalUnionSeconds(d).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("covered_seconds") == 150L)
    assert(r(0).getAs[Long]("n_intervals") == 3L)
  }

  test("intervalUnionSeconds: contained interval adds nothing") {
    // [0,100) contains [10,20): union is 100 s.
    val d = ev(
      (1L, "2024-01-01 00:00:00", 4L, 100.0),
      (2L, "2024-01-01 00:00:10", 4L, 10.0))
    val r = TimeSeries.intervalUnionSeconds(d).collect()
    assert(r(0).getAs[Long]("covered_seconds") == 100L)
  }

  test("decayedScore weights halve per hour of age from the user's max ts") {
    // ages 0h, 1h, 2h with horizon 3 → weights 2³, 2², 2¹.
    val d = ev(
      (1L, "2024-01-01 00:00:00", 5L, 1.00),
      (2L, "2024-01-01 01:00:00", 5L, 1.00),
      (3L, "2024-01-01 02:00:00", 5L, 1.00))
    val r = TimeSeries.decayedScore(d, horizonHours = 3).collect()
    assert(r(0).getAs[Long]("decayed_score") == 100L * (2L + 4L + 8L))
    assert(r(0).getAs[Boolean]("active"))
  }

  test("decayedScore: samples beyond the horizon weigh zero, user inactive") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 6L, 9.99),
      (2L, "2024-01-10 00:00:00", 6L, 0.00)) // max-ts anchor, zero value
    val r = TimeSeries.decayedScore(d, horizonHours = 3).collect()
    assert(r(0).getAs[Long]("decayed_score") == 0L)
    // the age-0 (zero-value) sample still has positive weight → active
    assert(r(0).getAs[Boolean]("active"))
  }
  /** `counts(i)` events in hour i of 2024-01-01, single type. */
  private def hourlyCounts(counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(j => ((h * 1000 + j).toLong,
        ts(f"2024-01-01 $h%02d:00:${j % 60}%02d"), 1L, "view", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("lagAutocorr: period-2 series gives r = 1 at lag 2, r = -1 at lag 1") {
    val d = hourlyCounts(Seq(1, 2, 1, 2, 1, 2))
    val at2 = TimeSeries.lagAutocorr(d, 2).collect().head
    assert(at2.getAs[Long]("n_pairs") == 4L)
    assert(at2.getAs[Double]("r") == 1.0)
    val at1 = TimeSeries.lagAutocorr(d, 1).collect().head
    // sqrt(d1)*sqrt(d2) rounds once, so r sits within 1 ulp of -1 — the
    // VALUE is still engine-exact (the oracle computes the identical tree)
    assert(math.abs(at1.getAs[Double]("r") + 1.0) < 1e-12)
  }

  test("lagAutocorr: constant series is dropped (zero variance), gaps pair nothing") {
    val flat = TimeSeries.lagAutocorr(hourlyCounts(Seq(3, 3, 3, 3)), 1)
    assert(flat.collect().isEmpty)
    // hours 0 and 2 only: no lag-1 pair exists
    val gappy = hourlyCounts(Seq(2, 0, 5))
    assert(TimeSeries.lagAutocorr(gappy, 1).collect().isEmpty)
  }

  test("hourOfDaySeasonality: exact daily periodicity gives eta2 = 1, flat is dropped") {
    // two identical days: every hod group has zero within-group variance
    val periodic = hourlyCounts((0 until 48).map(h => (h % 24) + 1))
    val r = TimeSeries.hourOfDaySeasonality(periodic).collect().head
    assert(r.getAs[Long]("n_hours") == 48L && r.getAs[Long]("n_hods") == 24L)
    assert(r.getAs[Double]("eta2") == 1.0)
    val flat = TimeSeries.hourOfDaySeasonality(hourlyCounts(Seq.fill(48)(3)))
    assert(flat.collect().isEmpty)
  }

}
