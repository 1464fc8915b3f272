package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class Analytics5Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("minBalanceSupplier: one balance per part and it is the minimum") {
    val df = Analytics5.minBalanceSupplier(
      Tables.region(spark, d), Tables.nation(spark, d), Tables.supplier(spark, d),
      Tables.part(spark, d), Tables.lineitem(spark, d), "EUROPE", 15, "STANDARD")
    val out = df.collect()
    assert(out.nonEmpty)
    // every row of one part carries the same (minimal) balance
    out.groupBy(_.getAs[Long]("p_partkey")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Double]("s_acctbal")).distinct.length == 1)
    }
    assert(out.forall(_.getAs[String]("p_type") == "STANDARD"))
    // the correlated-min reformulation must not plan a nested loop
    assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"))
  }

  test("forecastRevenue: single row, matches a direct recompute") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, d)
    val out = Analytics5.forecastRevenue(li,
      "1996-01-01 00:00:00", "1997-01-01 00:00:00", 0.05, 0.07, 24.0).collect()
    assert(out.length == 1)
    val expected = li.filter(
      col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(sum(col("l_extendedprice") * col("l_discount"))).head().getDouble(0)
    assert(math.abs(out.head.getAs[Double]("revenue") - expected) < 1.0)
  }

  test("productProfit: groups are (nation, year) unique, years in data range") {
    val out = Analytics5.productProfit(
      Tables.nation(spark, d), Tables.supplier(spark, d), Tables.part(spark, d),
      Tables.orders(spark, d), Tables.lineitem(spark, d), "red").collect()
    assert(out.nonEmpty)
    val keys = out.map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year")))
    assert(keys.distinct.length == keys.length)
    assert(out.forall { r => val y = r.getAs[Long]("o_year"); y >= 1995 && y <= 2001 })
  }

  test("importantParts: every survivor exceeds the fraction of the total") {
    val full = Analytics5.importantParts(
      Tables.nation(spark, d), Tables.supplier(spark, d), Tables.lineitem(spark, d),
      "NATION_3", 0.0).collect()
    val total = full.map(_.getAs[Double]("value")).sum
    val out = Analytics5.importantParts(
      Tables.nation(spark, d), Tables.supplier(spark, d), Tables.lineitem(spark, d),
      "NATION_3", 0.001).collect()
    assert(out.nonEmpty && out.length < full.length)
    assert(out.forall(_.getAs[Double]("value") > total * 0.001 * 0.999))
  }

  test("shipSpeedPriority: the two speed classes partition the joined lines") {
    import org.apache.spark.sql.functions._
    val out = Analytics5.shipSpeedPriority(
      Tables.orders(spark, d), Tables.lineitem(spark, d),
      "1996-01-01 00:00:00", "1997-01-01 00:00:00", 60).collect()
    assert(out.map(_.getAs[String]("ship_speed")).toSet.subsetOf(Set("FAST", "SLOW")))
    val totalLines = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey")).count()
    val counted = out.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    assert(counted == totalLines)
  }

  test("customerOrderDistribution: histogram masses sum to the customer count") {
    val out = Analytics5.customerOrderDistribution(
      Tables.customer(spark, d), Tables.orders(spark, d), "5-LOW").collect()
    assert(out.map(_.getAs[Long]("custdist")).sum == Tables.customer(spark, d).count())
  }

  test("promoRevenue is a percentage in [0, 100]") {
    val out = Analytics5.promoRevenue(
      Tables.lineitem(spark, d), Tables.part(spark, d),
      "1996-03-01 00:00:00", "1996-04-01 00:00:00", "PROMO").collect()
    assert(out.length == 1)
    val p = out.head.getAs[Double]("promo_revenue")
    assert(p >= 0.0 && p <= 100.0)
  }

  test("idleRichCustomers: anti join keeps only lapsed customers, plans LeftAnti") {
    import org.apache.spark.sql.functions._
    val df = Analytics5.idleRichCustomers(
      Tables.customer(spark, d), Tables.orders(spark, d),
      Seq("AUTOMOBILE", "BUILDING", "MACHINERY"), "2000-01-01 00:00:00")
    assert(df.queryExecution.executedPlan.toString.contains("LeftAnti"))
    val out = df.collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("AUTOMOBILE", "BUILDING", "MACHINERY")
      .contains(r.getAs[String]("c_mktsegment"))))
    // cross-check the total count against a direct anti-join recompute
    val avgBal = Tables.customer(spark, d)
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY") &&
        col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal"))).head().getDouble(0)
    val expect = Tables.customer(spark, d)
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY") &&
        col("c_acctbal") > avgBal)
      .join(Tables.orders(spark, d).filter(col("o_orderdate") >= "2000-01-01"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(out.map(_.getAs[Long]("numcust")).sum == expect)
  }
}
