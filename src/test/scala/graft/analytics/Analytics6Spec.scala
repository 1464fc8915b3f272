package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class Analytics6Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("topSupplier: every returned supplier achieves the global max revenue") {
    val out = Analytics6.topSupplier(
      Tables.supplier(spark, d), Tables.lineitem(spark, d),
      "1996-01-01 00:00:00", "1996-04-01 00:00:00").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("partSupplierCounts: excluded brand/type absent, anti join in the plan") {
    val df = Analytics6.partSupplierCounts(
      Tables.part(spark, d), Tables.supplier(spark, d), Tables.lineitem(spark, d),
      "Brand#1", "PROMO", Seq(1, 5, 10, 15, 20, 25, 30, 35))
    assert(df.queryExecution.executedPlan.toString.contains("LeftAnti"))
    val out = df.collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("p_brand") != "Brand#1"))
    assert(out.forall(_.getAs[String]("p_type") != "PROMO"))
    assert(out.forall(r => Set(1, 5, 10, 15, 20, 25, 30, 35)
      .contains(r.getAs[Int]("p_size"))))
    assert(out.forall(_.getAs[Long]("supplier_cnt") >= 1L))
  }

  test("largeVolumeCustomers: all totals above threshold, top-K plans TakeOrdered") {
    val df = Analytics6.largeVolumeCustomers(
      Tables.customer(spark, d), Tables.orders(spark, d), Tables.lineitem(spark, d),
      300.0, k = 3)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val out = df.collect()
    assert(out.nonEmpty && out.length <= 3)
    assert(out.forall(_.getAs[Double]("total_qty") > 300.0))
    val prices = out.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("disjunctiveRevenue: one row; zero branches give zero matches") {
    val out = Analytics6.disjunctiveRevenue(
      Tables.lineitem(spark, d), Tables.part(spark, d), Seq(
        ("Brand#1", 1, 5, 1.0, 11.0),
        ("Brand#2", 1, 10, 10.0, 20.0),
        ("Brand#3", 1, 15, 20.0, 30.0))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("revenue") > 0.0)
    val none = Analytics6.disjunctiveRevenue(
      Tables.lineitem(spark, d), Tables.part(spark, d),
      Seq(("NO_SUCH_BRAND", 1, 50, 0.0, 50.0))).collect()
    assert(none.head.isNullAt(none.head.fieldIndex("revenue")))
  }

  test("partPromotionSuppliers: semi join in the plan; share test holds") {
    import org.apache.spark.sql.functions._
    val df = Analytics6.partPromotionSuppliers(
      Tables.supplier(spark, d), Tables.part(spark, d), Tables.lineitem(spark, d),
      "STANDARD", "1996-01-01 00:00:00", "1997-01-01 00:00:00", 0.5)
    assert(df.queryExecution.executedPlan.toString.contains("LeftSemi"))
    val out = df.collect()
    assert(out.nonEmpty)
    // a fraction > 1 can never qualify anyone
    val none = Analytics6.partPromotionSuppliers(
      Tables.supplier(spark, d), Tables.part(spark, d), Tables.lineitem(spark, d),
      "STANDARD", "1996-01-01 00:00:00", "1997-01-01 00:00:00", 1.01)
    assert(none.count() == 0)
    val names = out.map(_.getAs[String]("s_name"))
    assert(names.sorted.sameElements(names))
    assert(names.toSet.subsetOf(Tables.supplier(spark, d)
      .select(col("s_name")).collect().map(_.getString(0)).toSet))
  }

  test("waitingSuppliers: sole-late-supplier counting matches a direct recompute") {
    import org.apache.spark.sql.functions._
    val out = Analytics6.waitingSuppliers(
      Tables.supplier(spark, d), Tables.orders(spark, d), Tables.lineitem(spark, d),
      60, k = 100).collect()
    assert(out.nonEmpty)
    val waits = out.map(_.getAs[Long]("numwait"))
    assert(waits.zip(waits.tail).forall { case (a, b) => a >= b })
    // recompute the total count of qualifying late lines driver-side
    val lo = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      .collect()
    val byOrder = lo.groupBy(_.getAs[Long]("l_orderkey"))
    val expectTotal = byOrder.values.map { rows =>
      val supps = rows.map(_.getAs[Long]("l_suppkey")).distinct
      val lateSupps = rows.filter(_.getAs[Boolean]("late"))
        .map(_.getAs[Long]("l_suppkey")).distinct
      if (supps.length > 1 && lateSupps.length == 1)
        rows.count(r => r.getAs[Boolean]("late"))
      else 0
    }.sum
    assert(waits.sum == expectTotal)
  }
}
