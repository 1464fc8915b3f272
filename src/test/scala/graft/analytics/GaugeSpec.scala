package graft.analytics

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GaugeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("hourlyLocf: carries the latest sample forward, nothing before the first sample") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 samples at 02:30 (v=1.0) and 05:00 (v=2.0); u2 single sample at
    // 00:10 with a same-ts duplicate where the higher event_id must win
    val ev = Seq(
      (10L, 1L, ts("2024-03-01 02:30:00"), 1.0),
      (11L, 1L, ts("2024-03-01 05:00:00"), 2.0),
      (12L, 2L, ts("2024-03-01 00:10:00"), 7.0),
      (13L, 2L, ts("2024-03-01 00:10:00"), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Gauge.hourlyLocf(spark, ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("hr").toString, r.getAs[Double]("value")))

    // grid = hours from 00:00 (global min truncated) to 05:00 (global max)
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq == Seq("2024-03-01 03:00:00.0", "2024-03-01 04:00:00.0", "2024-03-01 05:00:00.0"))
    assert(u1.map(_._3).toSeq == Seq(1.0, 1.0, 2.0)) // LOCF then the 05:00 sample lands exactly on its hour
    val u2 = out.filter(_._1 == 2L)
    assert(u2.length == 5) // 01:00..05:00 (nothing at 00:00, before the first sample)
    assert(u2.forall(_._3 == 9.0)) // same-ts duplicate: max event_id wins
  }

  test("hourlyInterpolated: lerps between samples, carries past the last") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // u1: 100 cents at 01:00, 400 cents at 04:00 → grid hours 02:00/03:00
    // sit exactly 1/3 and 2/3 along the segment; 05:00 carries 400
    val ev = Seq(
      (10L, 1L, ts("2024-03-01 01:00:00"), 1.0),
      (11L, 1L, ts("2024-03-01 04:00:00"), 4.0),
      (12L, 2L, ts("2024-03-01 05:00:00"), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Gauge.hourlyInterpolated(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("hr").toString,
        r.getAs[Double]("value_cents")))
    val u1 = out.filter(_._1 == 1L).map(x => (x._2, x._3)).toSeq
    assert(u1 == Seq(
      ("2024-03-01 01:00:00.0", 100.0), // sample exactly on the hour
      ("2024-03-01 02:00:00.0", 200.0), // 1/3 of the way 100→400
      ("2024-03-01 03:00:00.0", 300.0),
      ("2024-03-01 04:00:00.0", 400.0),
      ("2024-03-01 05:00:00.0", 400.0))) // carried past the last sample
    // u2's first sample is at the grid's last hour: single emitted row
    val u2 = out.filter(_._1 == 2L).map(x => (x._2, x._3)).toSeq
    assert(u2 == Seq(("2024-03-01 05:00:00.0", 900.0)))
  }

  test("hourlyInterpolated: deterministic under repartition") {
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 ${m / 60}%02d:${m % 60}%02d:00")
    val ev = (0 until 300).map(i =>
      (i.toLong, (i % 7).toLong, ts(i * 4 % 1440), (i % 23) + 0.5))
      .toDF("event_id", "user_id", "ts", "value")
    val a = Gauge.hourlyInterpolated(ev).collect().toSeq
    val b = Gauge.hourlyInterpolated(ev.repartition(9)).collect().toSeq
    assert(a == b)
  }
}
