package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Counter/gauge time-series kernels from the observability toolbox that
  * the reference's ClickHouse backend ships as aggregate functions —
  * `deltaSum`, Prometheus-style `increase()` with counter-reset handling,
  * `intervalLengthSum`, and an exponentially time-decayed recency score —
  * re-expressed as per-key window + grouped aggregation so every one of
  * them partitions freely by key and survives a 100 TB stream.
  *
  * All four are computed in INTEGER arithmetic (cents / epoch-micros /
  * power-of-two weights) rather than floating point: per-key accumulation
  * order differs between Spark's parallel partials and any other engine's
  * scan order, so integer math is what makes the results hash-exact and
  * engine-independent, not just approximately right.
  *
  * Scale notes: every operator below is one hash shuffle on the series key
  * followed by a per-key sorted walk (window) and/or a map-side-combinable
  * aggregate. No global windows, no driver state, no collect.
  */
object TimeSeries {

  /** `value` (a 2-decimal gauge) as exact integer cents. */
  private val cents = round(col("value") * 100).cast("long")

  /** ClickHouse `deltaSum(value)` per user: the sum of POSITIVE deltas
    * between consecutive samples in (ts, event_id) order — the total
    * upward movement of a gauge, immune to dips. One shuffle on user_id;
    * the lag window and the final sum both ride the same partitioning.
    * Ref semantics: ClickHouse deltaSum docs (negative deltas ignored). */
  /** Lag-`lagHours` autocorrelation of each key's hourly count series —
    * the daily-seasonality detector at lag 24: Pearson r between count(t)
    * and count(t + lag), computed over hours where BOTH ends exist (gaps
    * contribute no pair; pair with the gauge-fill grid for a dense
    * series). Every sum (n, Σx, Σy, Σx², Σy², Σxy) is an exact BIGINT;
    * the numerator `n·Σxy − Σx·Σy` and both variance terms are computed
    * IN INTEGERS and cast once, so `r = num / (√d1 · √d2)` is three
    * correctly-rounded IEEE ops — engine-exact. Keys whose either end is
    * constant (zero variance) are dropped rather than emitting NaN/Inf.
    *
    * Scale shape: events reduce to (key, hour) at the first aggregation;
    * the lag pairing is a self equi-join on (key, shifted hour) over
    * hour-count-sized frames; the moment rollup is map-side combinable.
    * BIGINT bound: n·Σxy needs hourly counts · series length² under
    * ~9·10¹⁸ — 10⁶ rows/hour over a decade sits at ~10¹⁶. */
  def lagAutocorr(events: DataFrame, lagHours: Int = 24): DataFrame = {
    val h = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("x"))
    val shifted = h.select(col("event_type"),
      (col("hr") - expr(s"INTERVAL $lagHours HOURS")).as("hr"),
      col("x").as("y"))
    val m = h.join(shifted, Seq("event_type", "hr"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("d1", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("d2", col("n") * col("syy") - col("sy") * col("sy"))
      .filter(col("d1") > 0L && col("d2") > 0L)
    m.select(col("event_type"), col("n").as("n_pairs"),
        (col("num").cast("double") /
          (sqrt(col("d1").cast("double")) * sqrt(col("d2").cast("double"))))
          .as("r"))
      .orderBy(col("event_type"))
  }

  /** Hour-of-day seasonality strength per key: the one-way-ANOVA η² of
    * the hour-of-day factor over the key's hourly count series —
    * `SS_between / SS_total`, i.e. the fraction of hourly-count variance
    * the time-of-day profile explains (1 = perfectly periodic daily
    * shape, 0 = no daily structure). Complements [[lagAutocorr]]: η²
    * measures the WHOLE 24-slot profile, not one lag.
    *
    * Exactness: group aggregates (n_g, S_g) and totals (n, Σx, Σx²) are
    * exact BIGINTs; each `S_g²/n_g` cell is one double rounding, and the
    * 24-cell sum is folded LEFT-TO-RIGHT over hod order (the
    * [[Stats.cramersV]] ordered-fold discipline) so the double result is
    * partition-order-free and engine-exact. Zero-variance keys are
    * dropped. Scale shape: events reduce to (key, hour) first; everything
    * after runs on ≤ 24 rows per key. */
  def hourOfDaySeasonality(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("x"))
      .withColumn("hod", hour(col("hr")))
    val g = hourly.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"))
    val tot = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    g.join(tot, "event_type")
      .select(col("event_type"), col("n"), col("sx"), col("sxx"),
        struct(col("hod"),
          ((col("s_g") * col("s_g")).cast("double") / col("n_g")).as("cell"))
          .as("kc"))
      .groupBy(col("event_type"), col("n"), col("sx"), col("sxx"))
      .agg(sort_array(collect_list(col("kc"))).as("cells"))
      .withColumn("n_hods", size(col("cells")).cast("long"))
      .withColumn("cm", (col("sx") * col("sx")).cast("double") / col("n"))
      .withColumn("ssb", aggregate(col("cells"), lit(0.0),
        (acc, x) => acc + x.getField("cell")) - col("cm"))
      .withColumn("sst", col("sxx").cast("double") - col("cm"))
      .filter(col("sst") > 0.0)
      .select(col("event_type"), col("n").as("n_hours"), col("n_hods"),
        (col("ssb") / col("sst")).as("eta2"))
      .orderBy(col("event_type"))
  }

  def deltaSum(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), cents.as("cents"))
      .withColumn("delta", col("cents") - lag(col("cents"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("delta") > 0, col("delta")).otherwise(0L)).as("delta_sum_cents"),
        count(lit(1)).as("n_samples"))
      .orderBy(col("user_id"))
  }

  /** Prometheus-style `increase()` per (user, hour) over a counter that can
    * reset: consecutive-sample delta if non-negative, else the new value
    * itself (a reset is assumed to restart from zero, the standard
    * Prometheus correction). Each delta is attributed to the hour of the
    * LATER sample; a user's first sample contributes its full value (the
    * counter came into view). Integer cents end-to-end. */
  def counterIncrease(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), cents.as("cents"))
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .withColumn("inc",
        when(col("prev").isNull, col("cents"))
          .when(col("cents") >= col("prev"), col("cents") - col("prev"))
          .otherwise(col("cents")))
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(col("inc")).as("increase_cents"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** ClickHouse `intervalLengthSum`: per user, the length of the UNION of
    * the intervals `[ts, ts + round(value) seconds)` — overlap counted
    * once. Classic sweep in one per-key window pass: walk intervals in
    * start order keeping the running max of interval ends; each interval
    * contributes `max(0, end − max(start, prev_running_end))`. Exact in
    * epoch-micros BIGINT. O(n log n) per key (the sort inside the window
    * exchange), no pairwise interval join. */
  def intervalUnionSeconds(events: DataFrame): DataFrame = {
    val startUs = unix_micros(col("ts"))
    val endUs = startUs + round(col("value")).cast("long") * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), startUs.as("s"), endUs.as("e"))
      .withColumn("prev_end", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("covered",
        greatest(col("e") - greatest(col("s"), coalesce(col("prev_end"), col("s"))), lit(0L)))
      .groupBy(col("user_id"))
      .agg(sum(col("covered")).as("covered_us"), count(lit(1)).as("n_intervals"))
      .withColumn("covered_seconds", expr("covered_us DIV 1000000"))
      .select(col("user_id"), col("covered_seconds"), col("n_intervals"))
      .orderBy(col("user_id"))
  }

  /** Exponentially time-decayed activity score per user — the recency-
    * weighted engagement metric behind "hot users/keys" panels (ClickHouse:
    * `exponentialTimeDecayedSum`). Weight halves every hour of age relative
    * to the user's OWN latest sample and hits zero beyond `horizonHours`:
    * weight = 2^(horizonHours − age_h), an exact power of two, so
    * score = Σ cents·weight is exact BIGINT — no libm `exp()`, whose last-
    * ulp differences across engines would break hash comparison.
    * Overflow headroom: cents < 2¹⁶, weight ≤ 2³⁰ → 2⁴⁶ per row; 2¹⁷ rows
    * per key before approaching 2⁶³. Two grouped passes over the same
    * user_id shuffle (max-ts, then the weighted sum). */
  def decayedScore(events: DataFrame, horizonHours: Int = 30): DataFrame = {
    require(horizonHours > 0 && horizonHours <= 40, "horizon must keep 2^h in BIGINT headroom")
    val w = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), cents.as("cents"), unix_micros(col("ts")).as("x"))
      .withColumn("maxx", max(col("x")).over(w))
      // integer DIV, not `/`: double division of 10¹⁵-magnitude micros is
      // rounded and could land a boundary age in the wrong hour bin.
      .withColumn("age_h", expr("CAST((maxx - x) DIV 3600000000 AS INT)"))
      .withColumn("weight",
        when(col("age_h") < horizonHours,
          expr(s"shiftleft(CAST(1 AS BIGINT), $horizonHours - age_h)"))
          .otherwise(lit(0L)))
      .groupBy(col("user_id"))
      .agg(sum(col("cents") * col("weight")).as("decayed_score"),
        max(when(col("weight") > 0, lit(1)).otherwise(lit(0))).cast("boolean").as("active"))
      .orderBy(col("user_id"))
  }
}
