package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed interval join equals the brute-force non-equi join") {
    import spark.implicits._
    // points every 5 hours over ~2 months; intervals of varying lengths,
    // including zero-length, bucket-straddling, and reversed (matches none)
    val points = (0 until 300)
      .map(i => (i.toLong, new Timestamp(ts("2024-01-01 00:00:00").getTime + i * 5L * 3600 * 1000)))
      .toDF("pid", "t")
    val intervals = Seq(
      (1L, ts("2024-01-03 00:00:00"), ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-09 12:00:00"), ts("2024-01-09 12:00:00")), // zero-length
      (3L, ts("2024-01-31 23:00:00"), ts("2024-02-02 01:00:00")), // straddles buckets
      (4L, ts("2024-02-20 00:00:00"), ts("2024-02-10 00:00:00")), // reversed
      (5L, ts("2023-11-01 00:00:00"), ts("2023-12-01 00:00:00")), // before all points
      (6L, ts("2024-01-05 00:00:00"), ts("2024-01-25 00:00:00"))  // long: many buckets
    ).toDF("iid", "s", "e")

    val bucketed = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 86400L)
      .select("pid", "iid")
    val brute = points.crossJoin(intervals)
      .where(col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid")

    assert(brute.count() > 0)
    assert(bucketed.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(bucketed).count() == 0)
    // one bucket per point => no duplicate pairs even for long intervals
    assert(bucketed.count() == bucketed.distinct().count())
  }

  test("plans as an equi-join on the bucket, not a nested loop") {
    val orders = graft.Tables.orders(spark, SparkTestBase.sfDir)
    val lineitem = graft.Tables.lineitem(spark, SparkTestBase.sfDir)
    val plan = RangeJoin.shipmentsInWindows(orders, lineitem)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
