package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class Analytics4Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("marketShare: shares are valid fractions per year") {
    val out = Analytics4.marketShare(
      Tables.region(spark, d), Tables.nation(spark, d), Tables.customer(spark, d),
      Tables.supplier(spark, d), Tables.orders(spark, d), Tables.lineitem(spark, d),
      Tables.part(spark, d), "ASIA", "ECONOMY", "NATION_2",
      "1995-01-01 00:00:00", "1997-01-01 00:00:00").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("o_year")).distinct.length == out.length)
    out.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s"share out of range: $s")
    }
  }

  test("marketShare of an impossible nation is zero everywhere") {
    val out = Analytics4.marketShare(
      Tables.region(spark, d), Tables.nation(spark, d), Tables.customer(spark, d),
      Tables.supplier(spark, d), Tables.orders(spark, d), Tables.lineitem(spark, d),
      Tables.part(spark, d), "ASIA", "ECONOMY", "NO_SUCH_NATION",
      "1995-01-01 00:00:00", "1997-01-01 00:00:00").collect()
    assert(out.forall(_.getAs[Double]("mkt_share") == 0.0))
  }

  test("cubeActivity: contains the grand-total grouping set") {
    import org.apache.spark.sql.functions._
    val out = Analytics4.cubeActivity(Tables.events(spark, d))
    val grand = out.filter(col("event_type").isNull && col("hour_of_day").isNull).collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.events(spark, d).count())
  }

  test("purchasedAndSignedUp is contained in both activity sets") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, d)
    val both = Analytics4.purchasedAndSignedUp(ev).collect().map(_.getLong(0)).toSet
    val purchasers = ev.filter(col("event_type") === "purchase")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val signups = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(both.subsetOf(purchasers) && both.subsetOf(signups))
    assert(both == purchasers.intersect(signups))
  }

  test("fullOuterActivity keeps users from either side with null pads") {
    import org.apache.spark.sql.functions._
    val out = Analytics4.fullOuterActivity(Tables.events(spark, d))
    // no user lost: row count = |purchasers ∪ signups|
    val ev = Tables.events(spark, d)
    val union = ev.filter(col("event_type").isin("purchase", "signup"))
      .select("user_id").distinct().count()
    assert(out.count() == union)
    assert(out.filter(col("user_id").isNull).count() == 0)
  }

  test("returnedItems: k rows max, revenue descending, only R-flag revenue") {
    val out = Analytics4.returnedItems(
      Tables.customer(spark, d), Tables.orders(spark, d), Tables.lineitem(spark, d),
      Tables.nation(spark, d), "1996-01-01 00:00:00", "1996-04-01 00:00:00", k = 5)
      .collect()
    assert(out.length <= 5)
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(revs.forall(_ > 0.0))
  }
}
