package graft.analytics

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[Lttb]] parallel downsampler: spike preservation (the property LTTB
  * exists for), endpoint pinning, per-series isolation, and the
  * one-point-per-bucket identity case. */
class LttbSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String, Double)*) = {
    import spark.implicits._
    rows.map { case (id, t, typ, v) => (id, ts(t), 1L, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("interior bucket keeps the spike, endpoints pin first/last points") {
    // 8 points a minute apart, flat at 10 except a 100.0 spike at minute 3.
    // nBuckets=4 buckets minutes {0,1},{2,3},{4,5},{6,7}.
    val d = ev((0 to 7).map { m =>
      (m.toLong, f"2024-01-01 00:0$m%d:00", "view",
        if (m == 3) 100.0 else 10.0)
    }: _*)
    val r = Lttb.downsample(d, nBuckets = 4).collect()
      .map(x => x.getAs[Int]("bucket") -> x.getAs[Timestamp]("ts")).toMap
    assert(r.size == 4)
    assert(r(0) == ts("2024-01-01 00:00:00")) // first point pinned
    assert(r(1) == ts("2024-01-01 00:03:00")) // spike survives decimation
    assert(r(3) == ts("2024-01-01 00:07:00")) // last point pinned
  }

  test("avg/max decimation would lose the spike amplitude; LTTB keeps it") {
    val d = ev((0 to 7).map { m =>
      (m.toLong, f"2024-01-01 00:0$m%d:00", "view",
        if (m == 3) 100.0 else 10.0)
    }: _*)
    val vals = Lttb.downsample(d, nBuckets = 4).collect().map(_.getAs[Double]("value"))
    assert(vals.contains(100.0))
  }

  test("one point per bucket returns every point unchanged") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", "view", 5.0),
      (2L, "2024-01-01 00:10:00", "view", 7.0),
      (3L, "2024-01-01 00:20:00", "view", 6.0),
      (4L, "2024-01-01 00:30:00", "view", 9.0))
    val r = Lttb.downsample(d, nBuckets = 4).collect()
    assert(r.length == 4)
    assert(r.map(_.getAs[Double]("value")).sorted.toSeq == Seq(5.0, 6.0, 7.0, 9.0))
  }

  test("series are decimated independently (own bounds, own buckets)") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", "view", 1.0),
      (2L, "2024-01-01 01:00:00", "view", 2.0),
      (3L, "2024-06-01 00:00:00", "click", 3.0),
      (4L, "2024-06-01 02:00:00", "click", 4.0))
    val r = Lttb.downsample(d, nBuckets = 2).collect()
    val bySeries = r.groupBy(_.getAs[String]("event_type"))
    assert(bySeries("view").length == 2 && bySeries("click").length == 2)
  }

  test("empty buckets are skipped; output rows = non-empty buckets") {
    // Two tight clusters at the ends of the range: middle buckets empty.
    val d = ev(
      (1L, "2024-01-01 00:00:00", "view", 1.0),
      (2L, "2024-01-01 00:01:00", "view", 2.0),
      (3L, "2024-01-01 00:29:00", "view", 3.0),
      (4L, "2024-01-01 00:30:00", "view", 4.0))
    val r = Lttb.downsample(d, nBuckets = 4).collect()
    assert(r.length == 2) // only the first and last buckets are populated
    val tss = r.map(_.getAs[Timestamp]("ts")).toSet
    assert(tss == Set(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")))
  }
}
