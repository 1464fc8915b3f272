package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class MaterializedRollupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("dailyCountsFromRollup: bit-identical to the raw-event aggregation") {
    val raw = Analytics.dailyCounts(Tables.events(spark, d)).collect()
    val mv = MaterializedRollup.dailyCountsFromRollup(spark, d, Tables.events(spark, d))
      .collect()
    assert(mv.length == raw.length && mv.nonEmpty)
    mv.zip(raw).foreach { case (a, b) =>
      assert(a == b, s"rollup row $a != raw row $b")
    }
  }

  test("the rollup-served query scans the summary table, not the events file") {
    val mv = MaterializedRollup.dailyCountsFromRollup(spark, d, Tables.events(spark, d))
    val plan = mv.queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      "materialized-rollup query still scans the raw events file")
    assert(plan.contains("events_hourly_rollup"),
      "materialized-rollup query does not read the summary table")
  }

  test("rollup build is memoized per (app, dir): repeat calls reuse the table") {
    val t1 = MaterializedRollup.hourlyRollupTable(spark, d, Tables.events(spark, d))
    val mtime1 = {
      val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(warehouse), t1)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(loc).getModificationTime
    }
    val t2 = MaterializedRollup.hourlyRollupTable(spark, d, Tables.events(spark, d))
    assert(t1 == t2)
    val mtime2 = {
      val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(warehouse), t2)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(loc).getModificationTime
    }
    assert(mtime1 == mtime2, "repeat call rewrote the rollup table")
  }
}
