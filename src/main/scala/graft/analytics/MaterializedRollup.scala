package graft.analytics

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ingest-time summary tables — the ClickHouse materialized-view /
  * SummingMergeTree pattern (the reference's engine family advertises
  * exactly this for its `logs` table; the reference itself delegates all
  * aggregation to full scans, `internal/db/db.go:81-99`).
  *
  * A rollup is maintained once at write time at a FINER granularity than
  * the queries it serves, storing re-aggregable partials: BIGINT counts
  * and exact DECIMAL sums (decimal addition is associative, so any
  * coarser re-aggregation of the partials is bit-identical to aggregating
  * the raw rows — a double-typed partial would NOT be). Queries then scan
  * group rows instead of events: at 100 TB the hourly rollup of a
  * billion-event day is a few thousand rows, and incremental upkeep is the
  * same groupBy on each micro-batch delta `foreachBatch`-merged
  * additively (the [[graft.streaming.LogStream]] sink pattern).
  */
object MaterializedRollup {

  /** Idempotent managed-table write (same JVM-crash hygiene as
    * [[Bucketing.writeBucketed]], minus the bucketing). */
  private def writeTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(warehouse), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  private val prepared = scala.collection.concurrent.TrieMap[(String, String), String]()

  /** Memoized hourly rollup of the events fixture: one row per
    * (event_type, hour) carrying `n` and the exact decimal value sum.
    * Built once per (app, dir); registered queries re-read the table. */
  def hourlyRollupTable(spark: SparkSession, dir: String,
      events: => DataFrame): String = {
    val appId = spark.sparkContext.applicationId
    prepared.getOrElseUpdate((appId, dir), {
      val name = s"events_hourly_rollup_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      writeTable(
        events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 4))).as("value_dec")),
        name)
      name
    })
  }

  /** Daily counts served FROM the hourly rollup — same output (and oracle)
    * as [[Analytics.dailyCounts]] over raw events, but the scan reads
    * pre-aggregated group rows and re-aggregates ≤ 24 of them per day:
    * `sum(n)` and `sum(value_dec)` over decimal partials are associative,
    * so the result is bit-identical to the raw-event aggregation. */
  def dailyCountsFromRollup(spark: SparkSession, dir: String,
      events: => DataFrame): DataFrame =
    spark.table(hourlyRollupTable(spark, dir, events))
      .groupBy(col("event_type"), date_trunc("day", col("hour")).as("day"))
      .agg(sum(col("n")).as("n"),
        sum(col("value_dec")).cast("double").as("total_value"))
      .orderBy(col("event_type"), col("day"))
}
