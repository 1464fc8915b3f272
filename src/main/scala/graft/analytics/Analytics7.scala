package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventh analytics tranche: the remaining ClickHouse aggregate-function
  * analogues from the observability toolbox — `uniqUpTo`, `topKWeighted`,
  * `quantileExactWeighted`, `boundingRatio` — each as a shape that keeps
  * its heavy reduction map-side-combinable and its windows over bounded
  * frames (distinct values / group count), never over raw event rows.
  */
object Analytics7 {

  /** `value` (a 2-decimal gauge) as exact integer cents. */
  private val cents = round(col("value") * 100).cast("long")

  /** ClickHouse `uniqUpTo(N)(user_id)` per event_type: the exact distinct
    * count while it is ≤ N, else N+1 ("more than N") — the cheap cardinality
    * gate dashboards use for "show exact count up to 100, then '100+'".
    * The cap is the API contract; the reduction is Spark's two-phase
    * distinct aggregate (partial distinct map-side). */
  def uniqUpTo(events: DataFrame, n: Int = 20): DataFrame =
    events.groupBy(col("event_type"))
      .agg(least(countDistinct(col("user_id")), lit(n.toLong + 1)).as("uniq_upto"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** ClickHouse `topKWeighted(k)`: per event_type, the k users with the
    * largest total value weight. Two-phase: keyed (type, user) aggregation
    * (map-side combinable), then a rank-filtered window that Spark plans as
    * WindowGroupLimit — each shuffle partition pre-trims to its local top-k
    * before the exchange, so a type with a billion users moves only
    * k·numPartitions rows. */
  def topKWeighted(events: DataFrame, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("weight_cents").desc, col("user_id"))
    events.groupBy(col("event_type"), col("user_id"))
      .agg(sum(cents).as("weight_cents"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("event_type"), col("rnk"))
  }

  /** ClickHouse `quantileExactWeighted(0.5)(value, weight)` per event_type,
    * with the weight taken from the `props` JSON attribute `k`: the
    * smallest value whose cumulative weight reaches half the total —
    * the exact DISCRETE weighted median, by counting. The only window runs
    * over the (type, distinct cents) frame — bounded by the value domain,
    * never by event count — the same construction as the adaptive quality
    * gate. Integer weights and cents throughout → engine-exact. */
  def weightedMedian(events: DataFrame): DataFrame = {
    val weight = get_json_object(col("props"), "$.k").cast("long")
    val grouped = events
      .select(col("event_type"), cents.as("c"), weight.as("wt"))
      .groupBy(col("event_type"), col("c"))
      .agg(sum(col("wt")).as("w"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("event_type"))
    grouped
      .withColumn("cum_w", sum(col("w")).over(wCum))
      .withColumn("tot_w", sum(col("w")).over(wTot))
      .filter(col("cum_w") * 2 >= col("tot_w"))
      .groupBy(col("event_type"))
      .agg(min(col("c")).as("weighted_median_cents"), max(col("tot_w")).as("total_weight"))
      .orderBy(col("event_type"))
  }

  /** The ClickHouse `-If` combinator family in one frame: per event_type,
    * countIf / sumIf / minIf / maxIf over the high-value slice (cents ≥
    * `thresholdCents`). Each combinator is its base aggregate over a CASE
    * projection — one map-side-combinable grouped pass, no second scan per
    * condition. sum/min/max are NULL for a group with no qualifying row
    * (ClickHouse -If semantics for empty slices of these aggregates). */
  def aggIfReport(events: DataFrame, thresholdCents: Long = 10000L): DataFrame = {
    val qual = when(cents >= thresholdCents, cents)
    events.select(col("event_type"), qual.as("qc"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("qc").isNotNull, 1L).otherwise(0L)).as("count_if"),
        sum(col("qc")).as("sum_if"),
        min(col("qc")).as("min_if"),
        max(col("qc")).as("max_if"))
      .orderBy(col("event_type"))
  }

  /** ClickHouse `avgWeighted(value, weight)` per event_type, weight from
    * the props JSON attribute `k`: both sums exact integer, ONE final IEEE
    * division — engine-exact without decimal gymnastics. */
  def avgWeighted(events: DataFrame): DataFrame =
    events.select(col("event_type"), cents.as("c"),
      get_json_object(col("props"), "$.k").cast("long").as("wt"))
      .groupBy(col("event_type"))
      .agg(sum(col("c") * col("wt")).as("wv_sum"), sum(col("wt")).as("w_sum"))
      .withColumn("avg_weighted_cents", col("wv_sum").cast("double") / col("w_sum"))
      .orderBy(col("event_type"))

  /** Equi-DEPTH histogram per event_type: `bins` buckets of ~equal event
    * count, each distinct cents value assigned whole to the bucket of its
    * cumulative position (`(cum−1)·bins DIV n`) — the deterministic
    * integer-math analogue of ClickHouse's adaptive `histogram()` (whose
    * random streaming merges are irreproducible by design). One keyed
    * value reduction, cumulative windows over distinct values, a second
    * keyed aggregation to (type, bin) envelopes. */
  def equiDepthHistogram(events: DataFrame, bins: Int = 10): DataFrame = {
    val g = events.select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("cnt"))
    val wC = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy(col("event_type"))
    g.withColumn("cum", sum(col("cnt")).over(wC))
      .withColumn("n", sum(col("cnt")).over(wT))
      .withColumn("bin", expr(s"CAST((cum - 1) * $bins DIV n AS INT) + 1"))
      .groupBy(col("event_type"), col("bin"))
      .agg(min(col("c")).as("lo_cents"), max(col("c")).as("hi_cents"),
        sum(col("cnt")).as("n_events"), count(lit(1)).as("n_distinct"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** Rolling 24-hour distinct users evaluated at each hour — the trailing
    * DAU panel. Exact, without a sliding-window distinct state: reduce to
    * the DISTINCT (user, hour) frame, explode each row into the 24 target
    * hours it remains visible to (a generated sequence — group rows × 24,
    * never raw events), then count distinct users per target hour. Only
    * hours the stream actually contains are reported. */
  def rollingDau(events: DataFrame, windowHours: Int = 24): DataFrame = {
    val uh = events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr")).distinct()
    val targets = uh.select(col("user_id"),
      explode(sequence(col("hr"),
        col("hr") + expr(s"INTERVAL ${windowHours - 1} HOURS"),
        expr("INTERVAL 1 HOUR"))).as("at_hr"))
    val present = uh.select(col("hr").as("at_hr")).distinct()
    targets.join(present, "at_hr")
      .groupBy(col("at_hr"))
      .agg(countDistinct(col("user_id")).as("dau_24h"))
      .orderBy(col("at_hr"))
  }

  /** Latency-band panel: exact DISCRETE p50/p90/p99 of value cents per
    * (event_type, day) by counting — the per-interval quantile heatmap an
    * observability dashboard draws. Rank condition in integers
    * (`100·cum ≥ q·n` with q in percent — cum is integral, so this IS the
    * ceil(q·n) discrete quantile), windows over (group, DISTINCT cents)
    * rows only: value-domain-bounded state, engine-exact output, and the
    * same construction stays safe when one group holds a billion events. */
  def valueBands(events: DataFrame): DataFrame = {
    val g = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"), cents.as("c"))
      .groupBy(col("event_type"), col("day"), col("c"))
      .agg(count(lit(1)).as("cnt"))
    val wC = Window.partitionBy(col("event_type"), col("day")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy(col("event_type"), col("day"))
    def pick(pct: Int) = min(when(col("cum") * 100 >= col("n") * pct, col("c")))
    g.withColumn("cum", sum(col("cnt")).over(wC))
      .withColumn("n", sum(col("cnt")).over(wT))
      .groupBy(col("event_type"), col("day"))
      .agg(pick(50).as("p50_cents"), pick(90).as("p90_cents"), pick(99).as("p99_cents"),
        max(col("n")).as("n_events"))
      .orderBy(col("event_type"), col("day"))
  }

  /** ClickHouse `boundingRatio(ts, value)` per user: the slope between the
    * chronologically first and last samples, in cents per second. Endpoint
    * extraction is `min(struct)`/`max(struct)` over (epoch-micros,
    * event_id, cents) — associative, map-side combinable, no window at
    * all. The single double division at the end is IEEE-exact on any
    * engine; a zero time span yields NULL. */
  def boundingRatio(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("x"), col("event_id").as("id"), cents.as("c")).as("pt"))
      .groupBy(col("user_id"))
      .agg(min(col("pt")).as("first_pt"), max(col("pt")).as("last_pt"))
      .select(col("user_id"),
        when(col("last_pt.x") === col("first_pt.x"), lit(null).cast("double"))
          .otherwise((col("last_pt.c") - col("first_pt.c")).cast("double") /
            ((col("last_pt.x") - col("first_pt.x")) / lit(1000000.0)))
          .as("cents_per_second"))
      .orderBy(col("user_id"))
}
