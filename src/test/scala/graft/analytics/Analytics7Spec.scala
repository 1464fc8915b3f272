package graft.analytics

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[Analytics7]] ClickHouse aggregate analogues on hand-computed
  * fixtures: the uniqUpTo cap, topKWeighted ordering and tie-break,
  * weighted-median counting semantics, and boundingRatio endpoints. */
class Analytics7Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, Long, String, Double, String)*) = {
    import spark.implicits._
    rows.map { case (id, t, u, typ, v, p) => (id, ts(t), u, typ, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("uniqUpTo returns exact counts up to n and caps at n+1") {
    val rows = (1 to 10).map(i =>
      (i.toLong, "2024-01-01 00:00:00", i.toLong, "many", 1.0, "{}")) ++
      Seq((11L, "2024-01-01 00:00:00", 1L, "few", 1.0, "{}"),
        (12L, "2024-01-01 00:00:00", 2L, "few", 1.0, "{}"))
    val r = Analytics7.uniqUpTo(ev(rows: _*), n = 3).collect()
      .map(x => x.getAs[String]("event_type") -> x.getAs[Long]("uniq_upto")).toMap
    assert(r == Map("many" -> 4L, "few" -> 2L)) // 10 distinct caps at n+1=4
  }

  test("topKWeighted ranks users by summed weight, ties to smaller id") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view", 10.00, "{}"),
      (2L, "2024-01-01 00:01:00", 1L, "view", 10.00, "{}"), // user 1: 20
      (3L, "2024-01-01 00:02:00", 2L, "view", 30.00, "{}"), // user 2: 30
      (4L, "2024-01-01 00:03:00", 3L, "view", 20.00, "{}"), // user 3: 20 (ties user 1)
      (5L, "2024-01-01 00:04:00", 4L, "view", 5.00, "{}"))
    val r = Analytics7.topKWeighted(d, k = 3).collect()
      .map(x => (x.getAs[Int]("rnk"), x.getAs[Long]("user_id")))
    assert(r.toSeq == Seq((1, 2L), (2, 1L), (3, 3L))) // tie 20==20 → id 1 first
  }

  test("weightedMedian: smallest value whose cumulative weight reaches half") {
    // values 1.00 (w=1), 2.00 (w=1), 3.00 (w=10): total 12, half 6 → 3.00.
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.00, """{"k": 1}"""),
      (2L, "2024-01-01 00:01:00", 2L, "view", 2.00, """{"k": 1}"""),
      (3L, "2024-01-01 00:02:00", 3L, "view", 3.00, """{"k": 10}"""))
    val r = Analytics7.weightedMedian(d).collect()
    assert(r(0).getAs[Long]("weighted_median_cents") == 300L)
    assert(r(0).getAs[Long]("total_weight") == 12L)
  }

  test("weightedMedian with uniform weights is the plain lower median") {
    val d = ev((1 to 5).map(i =>
      (i.toLong, "2024-01-01 00:00:00", i.toLong, "view", i.toDouble, """{"k": 2}""")): _*)
    val r = Analytics7.weightedMedian(d).collect()
    assert(r(0).getAs[Long]("weighted_median_cents") == 300L) // 3.00 of 1..5
  }

  test("boundingRatio: slope between first and last samples in cents/sec") {
    // 10.00 → 40.00 over 60 s = +3000 cents / 60 s = 50 cents/s.
    val d = ev(
      (1L, "2024-01-01 00:00:00", 7L, "view", 10.00, "{}"),
      (2L, "2024-01-01 00:00:30", 7L, "view", 99.00, "{}"), // interior ignored
      (3L, "2024-01-01 00:01:00", 7L, "view", 40.00, "{}"))
    val r = Analytics7.boundingRatio(d).collect()
    assert(r(0).getAs[Double]("cents_per_second") == 50.0)
  }

  test("equiDepthHistogram: near-equal bin weights, contiguous envelopes") {
    // 100 distinct values, one event each, 10 bins → exactly 10 per bin
    val d = ev((1 to 100).map(i =>
      (i.toLong, "2024-01-01 00:00:00", i.toLong, "view", i / 100.0, "{}")): _*)
    val r = Analytics7.equiDepthHistogram(d, bins = 10).collect()
      .map(x => (x.getAs[Int]("bin"), x.getAs[Long]("lo_cents"),
        x.getAs[Long]("hi_cents"), x.getAs[Long]("n_events")))
    assert(r.length == 10)
    assert(r.forall(_._4 == 10L))
    assert(r.map(_._1).toSeq == (1 to 10))
    // envelopes tile the domain in order: each bin's lo follows prev hi
    r.sliding(2).foreach { case Array(a, b) => assert(b._2 > a._3) }
  }

  test("rollingDau: each reported hour counts users from its trailing window") {
    // u1 at hour 0, u2 at hour 1, u1 again at hour 30 (outside u1@0's
    // 24h visibility for hour 30's window start... it IS hour 30 itself).
    val d = ev(
      (1L, "2024-01-01 00:30:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 01:15:00", 2L, "view", 1.0, "{}"),
      (3L, "2024-01-02 06:10:00", 1L, "view", 1.0, "{}"))
    val r = Analytics7.rollingDau(d).collect()
      .map(x => (x.getAs[java.sql.Timestamp]("at_hr").toString, x.getAs[Long]("dau_24h")))
      .toMap
    assert(r("2024-01-01 00:00:00.0") == 1L) // u1 only
    assert(r("2024-01-01 01:00:00.0") == 2L) // u1 + u2 visible
    // hour 30 (u1's second visit): u1@0 and u2@1 expired (>23h ago)
    assert(r("2024-01-02 06:00:00.0") == 1L)
    assert(r.size == 3) // only hours present in the stream are reported
  }

  test("valueBands: exact discrete percentiles per (type, day) by counting") {
    // 100 events valued 0.01..1.00 on one day: p50 = 0.50, p90 = 0.90,
    // p99 = 0.99 (smallest value whose cumulative count reaches ceil(q·n)).
    val d = ev((1 to 100).map(i =>
      (i.toLong, "2024-01-01 00:00:00", i.toLong, "view", i / 100.0, "{}")): _*)
    val r = Analytics7.valueBands(d).collect()(0)
    assert(r.getAs[Long]("p50_cents") == 50L)
    assert(r.getAs[Long]("p90_cents") == 90L)
    assert(r.getAs[Long]("p99_cents") == 99L)
    assert(r.getAs[Long]("n_events") == 100L)
  }

  test("boundingRatio: single sample (zero span) yields NULL") {
    val d = ev((1L, "2024-01-01 00:00:00", 8L, "view", 10.00, "{}"))
    val r = Analytics7.boundingRatio(d).collect()
    assert(r(0).isNullAt(r(0).fieldIndex("cents_per_second")))
  }
}
