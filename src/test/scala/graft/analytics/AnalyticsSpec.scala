package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private def dir = SparkTestBase.sfDir

  test("asof join: every matched order predates its event") {
    val events = Tables.events(spark, dir)
    val orders = Tables.orders(spark, dir)
    val res = Analytics.lastOrderBeforeEvent(events, orders)
    // re-attach the order date and check the as-of invariant
    val dated = res.join(
      orders.select(col("o_orderkey"), col("o_orderdate")), "o_orderkey")
    assert(dated.count() > 0)
    assert(dated.filter(col("o_orderdate") > col("ts")).count() == 0)
    // and it picked the LATEST such order: no other order of that user is
    // strictly between the matched date and the event
    val o2 = orders.select(col("o_custkey"), col("o_orderdate").as("other_date"))
    val better = dated
      .join(o2, dated("user_id") === o2("o_custkey"))
      .filter(col("other_date") > col("o_orderdate") && col("other_date") <= col("ts"))
    assert(better.count() == 0)
  }

  test("sessionize: session bounds ordered, gaps split sessions") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val ev = Seq(
      (1L, 10L, t("2024-01-01T00:00:00Z")),
      (2L, 10L, t("2024-01-01T00:10:00Z")), // same session (10 min gap)
      (3L, 10L, t("2024-01-01T01:00:00Z")), // 50 min gap → new session
      (4L, 20L, t("2024-01-01T00:00:00Z")))
      .toDF("event_id", "user_id", "ts")
    val res = Analytics.sessionize(ev, 30).collect()
    val u10 = res.filter(_.getAs[Long]("user_id") == 10L)
    assert(u10.map(_.getAs[Long]("session_id")).toSeq == Seq(1L, 2L))
    assert(u10.head.getAs[Long]("n_events") == 2L)
  }

  test("top events per user: rank bounded, values descending") {
    val res = Analytics.topEventsPerUser(Tables.events(spark, dir), 3).collect()
    val byUser = res.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rows =>
      assert(rows.length <= 3)
      val vals = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("value"))
      assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    }
  }

  test("pricing summary: groups partition the filtered rows") {
    val li = Tables.lineitem(spark, dir)
    val res = Analytics.pricingSummary(li, "1998-09-01 00:00:00")
    val total = res.agg(sum(col("count_order"))).collect().head.getLong(0)
    val want = li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00"))).count()
    assert(total == want)
  }

  test("except: no purchaser in the result ever signed up") {
    val events = Tables.events(spark, dir)
    val res = Analytics.purchasedNeverSignedUp(events)
    val signups = events.filter(col("event_type") === "signup").select(col("user_id"))
    assert(res.join(signups, "user_id").count() == 0)
  }
}
