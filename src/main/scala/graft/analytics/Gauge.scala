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

  /** Hourly LINEAR-INTERPOLATION resampling — the ClickHouse
    * `ORDER BY ... WITH FILL INTERPOLATE` analogue: each grid hour takes
    * the value lerped between its bracketing samples; hours past the last
    * sample carry it forward; hours before the first emit nothing (the
    * LOCF inner semantics).
    *
    * Construction: union the deduplicated samples with the generated grid
    * rows, ONE shuffle+sort per key, then two frame windows — the last
    * non-null sample at-or-before (samples sort before grid points at the
    * same instant, so an exactly-aligned sample wins) and the first
    * strictly-after. The lerp runs on exact integer cents/millis with a
    * fixed double shape, so the oracle reproduces it bit-for-bit. No
    * per-grid-point scans: each sample is touched once per window pass
    * regardless of key cardinality or sample density. */
  def hourlyInterpolated(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val samples = events
      .groupBy(col("user_id"), col("ts"))
      .agg(expr("max_by(value, event_id)").as("v"))
      .select(col("user_id"), col("ts").as("t"), lit(0).as("g"),
        round(col("v") * 100).cast("long").as("c"))
    val bounds = events.agg(
      date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
    val grid = events.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("t"),
        lit(1).as("g"), lit(null).cast("long").as("c"))
    val all = samples.unionByName(grid)
      .withColumn("tms", unix_millis(col("t")))
    val before = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("g"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val framed = all
      .withColumn("pc", last(col("c"), ignoreNulls = true).over(before))
      .withColumn("pt", last(when(col("c").isNotNull, col("tms")), ignoreNulls = true).over(before))
      .withColumn("nc", first(col("c"), ignoreNulls = true).over(after))
      .withColumn("nt", first(when(col("c").isNotNull, col("tms")), ignoreNulls = true).over(after))
    framed
      .filter(col("g") === 1 && col("pc").isNotNull)
      .select(col("user_id"), col("t").as("hr"),
        when(col("nc").isNull || col("nt") === col("pt"), col("pc").cast("double"))
          .otherwise(col("pc").cast("double") +
            (col("nc").cast("double") - col("pc").cast("double")) *
              ((col("tms") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")))
          .as("value_cents"))
      .orderBy(col("user_id"), col("hr"))
  }
}
