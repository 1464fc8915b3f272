package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gauge resampling: last-observation-carried-forward (LOCF) onto a
  * regular time grid — the downsampling step behind every dashboard that
  * charts an irregularly-sampled gauge at fixed resolution (ClickHouse
  * serves the same shape with `toStartOfHour` + `argMax` or ASOF JOIN).
  *
  * Construction: reduce samples to one row per (key, ts) (argmax on the
  * sample id — a deterministic tie-break, mirrored by the oracle's
  * `arg_max`), build the (key × hour) grid from the stream's own bounds
  * (a one-row aggregate broadcast into the key list), and attach the
  * latest sample at-or-before each grid point with the custom
  * [[graft.plans.AsOfJoin]] physical operator — O(n+m) merge walk per
  * key partition, no per-grid-point scan, no window over raw samples.
  * Inner semantics: grid hours before a key's first sample emit nothing.
  *
  * Scale: samples shuffle once (hash by key, sort by (key, ts) inside the
  * operator's required distribution); the grid is |keys| × |hours| rows —
  * generated, never stored — and shuffles on the same key. At 100 TB the
  * merge walk touches each sample once, which is the property that lets
  * the query survive a key with millions of samples. */
object Gauge {

  /** Hourly LOCF frame (user_id, hr, value) for the events gauge. */
  def hourlyLocf(spark: SparkSession, events: DataFrame): DataFrame = {
    val samples = events
      .groupBy(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .agg(expr("max_by(value, event_id)").as("s_value"))
    val bounds = events.agg(
      date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
    val grid = events.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("hr"))
    graft.plans.AsOfJoin.asofJoin(spark, grid, samples,
      leftKey = "user_id", rightKey = "s_user", leftTime = "hr", rightTime = "s_ts")
      .select(col("user_id"), col("hr"), col("s_value").as("value"))
      .orderBy(col("user_id"), col("hr"))
  }
}
