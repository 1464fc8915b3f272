package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rate-anomaly detection over the event stream — the alerting query an
  * observability stack runs on top of its per-interval counts ("this
  * service's error rate is 3σ off its norm").
  *
  * Shape: one keyed aggregation to (key, hour) counts, one keyed
  * aggregation to per-key moment sums, a broadcast-sized join back, and a
  * z-score filter. The per-key stats frame has one row per key — at 100 TB
  * the raw events reduce at the first aggregation and everything after is
  * group-cardinality-sized.
  *
  * Determinism: counts are integers, so the moment sums (Σx, Σx²) are
  * exact BIGINTs; mean/variance/z are then derived with identical IEEE
  * double expression trees on Spark and DuckDB (sample variance in the
  * integer-numerator form `(n·Σx² − (Σx)²) / (n·(n−1))`), making the
  * flagged set and the emitted doubles hash-comparable — no tolerance
  * compare needed.
  */
object Anomaly {

  /** Hours whose event count sits more than `zThreshold` sample standard
    * deviations from the key's own hourly mean. Keys with fewer than two
    * active hours or zero variance flag nothing (no baseline to deviate
    * from). Output: (event_type, hr, n, mean, z). */
  def rateAnomalies(events: DataFrame, zThreshold: Double = 2.0): DataFrame =
    rateAnomaliesFromCounts(
      events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n")),
      zThreshold)

  /** [[rateAnomalies]] from a pre-aggregated `(event_type, hr, n)` frame —
    * the serving-layer shape: the counts are BIGINT partials, so an
    * ingest-time rollup ([[MaterializedRollup]]) feeds this with
    * bit-identical flags to the raw-event scan while reading only group
    * rows. */
  def rateAnomaliesFromCounts(hourly: DataFrame, zThreshold: Double): DataFrame = {
    val stats = hourly
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("n")).as("sum_n"),
        sum(col("n") * col("n")).as("sum_n2"))
    hourly
      .join(broadcast(stats), "event_type")
      .filter(col("n_hours") > 1L)
      .withColumn("mean", col("sum_n").cast("double") / col("n_hours"))
      .withColumn("variance",
        (col("n_hours") * col("sum_n2") - col("sum_n") * col("sum_n")).cast("double") /
          (col("n_hours") * (col("n_hours") - 1L)).cast("double"))
      .filter(col("variance") > 0.0)
      .withColumn("z", (col("n").cast("double") - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) > zThreshold)
      .select(col("event_type"), col("hr"), col("n"), col("mean"), col("z"))
      .orderBy(col("event_type"), col("hr"))
  }

  /** Exact lower median of `valueCol` per `key` by counting: one keyed
    * (key, value) reduction, cumulative windows over DISTINCT values only
    * (value-domain-bounded, never group-row count). */
  /** CUSUM level-shift detection (Page, Biometrika 1954) over each key's
    * hourly count series, kept EXACT-INTEGER by scaling deviations by the
    * hour count: with hourly counts x₁..x_m and T = Σx, the scaled
    * deviation of hour i is `m·x_i − T` (integer, sums to zero), its
    * prefix sum S_i is an exact BIGINT, and the classic one-sided CUSUM
    * `C_i = S_i − min_{j≤i} S_j` falls out of two per-key running
    * windows — no recursion, no doubles. Output per key: the series
    * length, the maximum CUSUM (in count·m units — divide by m for
    * counts), and the hour where it peaks (earliest on ties, so the row
    * is total-ordered and hash-stable).
    *
    * Scale shape: one keyed agg to (key, hour) counts, then per-key
    * windows over hour-count-sized partitions (a year is 8 760 rows per
    * key), then a per-key 1-row argmax — nothing event-sized passes the
    * first aggregation. Hours with no events are absent from the series
    * (pair with the gauge-fill grid when a dense series is needed). */
  def cusumShift(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("x"))
    val per = Window.partitionBy(col("event_type"))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withC = hourly
      .withColumn("m", count(lit(1)).over(per))
      .withColumn("t", sum(col("x")).over(per))
      .withColumn("s", sum(col("m") * col("x") - col("t")).over(ord))
      .withColumn("cusum", col("s") - min(col("s")).over(ord))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(col("cusum").desc, col("hr"))
    withC
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("m").as("n_hours"),
        col("cusum").as("max_cusum"), col("hr").as("peak_hr"))
      .orderBy(col("event_type"))
  }

  private def lowerMedian(df: DataFrame, key: String, valueCol: String,
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(key), col(valueCol).as("_v")).agg(count(lit(1)).as("_c"))
    val wC = Window.partitionBy(col(key)).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy(col(key))
    g.withColumn("_cum", sum(col("_c")).over(wC))
      .withColumn("_tot", sum(col("_c")).over(wT))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col(key)).agg(min(col("_v")).as(out))
  }

  /** SLO burn rate per hour: the error-event fraction against the error
    * budget (1 − slo) — burn > 1 means the budget is being spent faster
    * than it accrues, the standard multi-window alert input (Google SRE
    * workbook ch. 5). Integer counts; the two divisions are identical
    * IEEE expression trees on any engine. */
  def sloBurn(events: DataFrame, slo: Double = 0.999): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
      .withColumn("err_rate", col("n_err").cast("double") / col("n_total"))
      .withColumn("burn_rate", col("err_rate") / lit(1.0 - slo))
      .orderBy(col("hr"))

  /** Apdex score per event_type (Apdex standard v1.1): satisfied ≤ T,
    * tolerating ≤ 4T, apdex = (satisfied + tolerating/2) / total —
    * computed as the single exact division (2·sat + tol) / (2·total) so
    * both engines emit the identical double. */
  def apdex(events: DataFrame, tCents: Long = 10000L): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(cents <= tCents, 1L).otherwise(0L)).as("n_satisfied"),
        sum(when(cents > tCents && cents <= 4 * tCents, 1L).otherwise(0L))
          .as("n_tolerating"))
      .withColumn("apdex",
        (col("n_satisfied") * 2 + col("n_tolerating")).cast("double") /
          (col("n_total") * 2))
      .orderBy(col("event_type"))
  }

  /** Robust (median/MAD) twin of [[rateAnomalies]]: flag hours where
    * |n − median| > k · MAD, with both the median and the median absolute
    * deviation exact discrete (lower) medians by counting — the
    * outlier-resistant alert a z-score misses when the baseline itself
    * contains spikes (one incident hour inflates σ and masks the next
    * incident; it barely moves the MAD). Integer comparisons end-to-end →
    * engine-exact flags, no tolerance compare. A key with MAD = 0 (more
    * than half its hours exactly at the median) flags ANY deviating hour —
    * the natural limit of the rule. Output: (event_type, hr, n, med, mad).
    *
    * Scale: the raw stream reduces at the first (type, hour) aggregation;
    * medians run over distinct-count frames; both stat frames broadcast. */
  def madAnomalies(events: DataFrame, k: Int = 3): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val med = lowerMedian(hourly, "event_type", "n", "med")
    val withMed = hourly.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("n") - col("med")))
    val mad = lowerMedian(withMed, "event_type", "dev", "mad")
    withMed.join(broadcast(mad), "event_type")
      .filter(col("dev") > col("mad") * k)
      .select(col("event_type"), col("hr"), col("n"), col("med"), col("mad"))
      .orderBy(col("event_type"), col("hr"))
  }
}
