package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

case class RollupEv(event_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)

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

  test("streaming upkeep: N foreachBatch merges end bit-identical to one rebuild") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val batch1 = Seq(
      RollupEv(1, t("2024-01-01T00:10:00Z"), "click", 1.25),
      RollupEv(2, t("2024-01-01T00:40:00Z"), "click", 2.5),
      RollupEv(3, t("2024-01-01T01:10:00Z"), "view", 3.75))
    val batch2 = Seq(
      RollupEv(4, t("2024-01-01T00:55:00Z"), "click", 4.25), // same hour as batch1 rows
      RollupEv(5, t("2024-01-01T02:05:00Z"), "view", 0.5))
    val table = "rollup_upkeep_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")

    val mem = MemoryStream[RollupEv]
    val q = mem.toDF().writeStream
      .foreachBatch { (delta: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        MaterializedRollup.upsertDelta(spark, table, delta.toDF())
      }
      .start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()

    val incremental = spark.table(table)
      .orderBy("event_type", "hour").collect().map(_.toSeq).toSeq
    spark.sql(s"DROP TABLE IF EXISTS ${table}_rebuild")
    MaterializedRollup.upsertDelta(spark, s"${table}_rebuild", (batch1 ++ batch2).toDF())
    val rebuilt = spark.table(s"${table}_rebuild")
      .orderBy("event_type", "hour").collect().map(_.toSeq).toSeq
    assert(incremental == rebuilt)
    // the same-hour group actually merged across batches: clicks in hour 0
    // arrived 2 in batch1 + 1 in batch2 → one row with n = 3
    assert(incremental.length == 3)
    assert(incremental.head(2) == 3L)
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

  test("HLL sketch partials: union of hourly sketches == one global sketch (uniqMerge law)") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val ev = graft.Tables.events(spark, d)
    val table = MaterializedRollup.hourlyUserSketchTable(spark, d, ev)
    val merged = spark.table(table).groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(user_hll))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct, "merging hourly partials must equal sketching the raw stream")
    // and the serving query's verdict holds
    val out = MaterializedRollup.distinctUsersFromSketches(spark, d, ev).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("approx_ok")))
  }
}
