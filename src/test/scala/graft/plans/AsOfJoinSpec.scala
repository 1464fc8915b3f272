package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}
import graft.analytics.Analytics

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private def dir = SparkTestBase.sfDir

  test("physical as-of join equals the union-marker expression") {
    val events = Tables.events(spark, dir)
    val orders = Tables.orders(spark, dir)
    val expected = Analytics.lastOrderBeforeEvent(events, orders).collect()
    val got = Analytics.lastOrderBeforeEventExec(spark, events, orders).collect()
    assert(got.length == expected.length)
    assert(got.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
  }

  test("merge walk: ties at equal time match (<=), unmatched left rows drop") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val left = Seq(
      (1L, 10L, t("2024-01-05T00:00:00Z")), // after both orders → latest wins
      (2L, 10L, t("2024-01-01T00:00:00Z")), // equal to first order ts → matches it
      (3L, 10L, t("2023-12-31T00:00:00Z")), // before everything → dropped
      (4L, 99L, t("2024-01-05T00:00:00Z"))) // key with no orders → dropped
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, t("2024-01-01T00:00:00Z"), 11.0),
      (101L, 10L, t("2024-01-03T00:00:00Z"), 22.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = AsOfJoin.asofJoin(spark, left, right,
      "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 101L), (2L, 100L)))
  }

  test("plan contains the custom exec node with exchanges/sorts supplied by the engine") {
    val events = Tables.events(spark, dir)
    val orders = Tables.orders(spark, dir)
    val plan = Analytics.lastOrderBeforeEventExec(spark, events, orders)
      .queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin "), plan.take(2000))
  }
}
