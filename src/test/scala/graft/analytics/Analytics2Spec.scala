package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class Analytics2Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private def dir = SparkTestBase.sfDir

  test("customer LTV: zero-order customers kept with value 0") {
    val cust = Tables.customer(spark, dir)
    val res = Analytics2.customerOrderStats(cust, Tables.orders(spark, dir))
    assert(res.count() == cust.count())
    val zeros = res.filter(col("n_orders") === 0)
    assert(zeros.filter(col("lifetime_value") =!= 0.0).count() == 0)
  }

  test("running revenue: non-decreasing within customer") {
    val res = Analytics2.runningRevenue(Tables.orders(spark, dir))
    val viol = res
      .withColumn("prev", lag(col("running_revenue"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))))
      .filter(col("prev").isNotNull && col("running_revenue") < col("prev"))
    assert(viol.count() == 0)
  }

  test("moving avg window never exceeds 3 rows and stays within value range") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val ev = Seq(
      (1L, 7L, t("2024-01-01T00:00:00Z"), 10.0),
      (2L, 7L, t("2024-01-01T00:01:00Z"), 20.0),
      (3L, 7L, t("2024-01-01T00:02:00Z"), 30.0),
      (4L, 7L, t("2024-01-01T00:03:00Z"), 40.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Analytics2.movingAvg(ev).collect().map(_.getAs[Double]("avg3"))
    assert(got.toSeq == Seq(10.0, 15.0, 20.0, 30.0))
  }

  test("tumbling windows partition the event count") {
    val ev = Tables.events(spark, dir)
    val res = Analytics2.tumblingCounts(ev)
    assert(res.agg(sum(col("n"))).collect().head.getLong(0) == ev.count())
    // starts are 6h-aligned
    val misaligned = res.filter(unix_timestamp(col("w_start")) % 21600 =!= 0)
    assert(misaligned.count() == 0)
  }

  test("token frequency: descending counts, lowercase tokens") {
    val res = Analytics2.tokenFrequency(Tables.documents(spark, dir), 10).collect()
    assert(res.length == 10)
    val ns = res.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(res.forall(r => r.getAs[String]("token") == r.getAs[String]("token").toLowerCase))
  }

  test("approx percentiles track the exact ones closely") {
    val li = Tables.lineitem(spark, dir)
    val exact = Analytics2.quantityPercentiles(li).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Analytics2.approxQuantityPercentiles(li).collect()
    approx.foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50) <= 2.0)
      assert(math.abs(r.getDouble(2) - p90) <= 2.0)
    }
  }

  test("order priority semi-join never multiplies orders") {
    val res = Analytics2.orderPriority(Tables.orders(spark, dir), Tables.lineitem(spark, dir),
      "1996-01-01 00:00:00", "1997-01-01 00:00:00")
    val total = res.agg(sum(col("n_orders"))).collect().head.getLong(0)
    val upper = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))).count()
    assert(total <= upper && total > 0)
  }
}
