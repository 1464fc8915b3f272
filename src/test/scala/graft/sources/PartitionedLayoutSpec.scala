package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class PartitionedLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("daily layout: one directory per day, round-trips the row count") {
    val path = PartitionedLayout.eventsDailyPath(spark, d, Tables.events(spark, d))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("d="))
    assert(dirs.nonEmpty)
    assert(dirs.forall(_.matches("d=20\\d{6}")))
    val part = spark.read.parquet(path)
    assert(part.count() == Tables.events(spark, d).count())
  }

  test("literal day predicate prunes at listing time (static pruning)") {
    val path = PartitionedLayout.eventsDailyPath(spark, d, Tables.events(spark, d))
    val one = spark.read.parquet(path).filter(col("d") === 20240105)
    val plan = one.queryExecution.executedPlan.toString
    // the partition predicate must land in PartitionFilters, NOT as a
    // row-level Filter over the full scan
    assert(plan.contains("PartitionFilters") && plan.contains("20240105"), plan.take(800))
    val expected = Tables.events(spark, d)
      .filter(date_format(col("ts"), "yyyyMMdd") === "20240105").count()
    assert(one.count() == expected)
  }

  test("dim join triggers DYNAMIC partition pruning and matches raw math") {
    val out = PartitionedLayout.countsOnTopRevenueDays(
      spark, d, Tables.events(spark, d), k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n${plan.take(1200)}")
    // equality against the same computation on the raw (unpartitioned) table
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, d)
    val top = ev.filter(col("event_type") === "purchase")
      .groupBy(date_format(col("ts"), "yyyyMMdd").cast("int").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rev"))
      .withColumn("rn", row_number().over(Window.orderBy(col("rev").desc, col("d"))))
      .filter(col("rn") <= 3).select("d")
    val raw = ev
      .withColumn("d", date_format(col("ts"), "yyyyMMdd").cast("int"))
      .join(top, Seq("d"))
      .groupBy(col("d"), col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("d"), col("event_type"))
      .collect().toSeq
    assert(out.collect().toSeq == raw)
  }
}
