package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Cols.dsum

/** Second analytics tranche: semi/anti/outer joins, window frames,
  * percentiles, string/case expressions, set unions, tumbling windows.
  * Same conventions as [[Analytics]]: pure DataFrame API, decimal-exact
  * double aggregates, deterministic total ordering.
  */
object Analytics2 {

  private val D18 = DecimalType(18, 2)

  /** TPC-H Q4-shaped: order counts per priority for orders with at least
    * one lineitem shipped 60+ days after the order date — a left-semi join
    * (EXISTS), which shuffles only keys and never multiplies rows. */
  def orderPriority(orders: DataFrame, lineitem: DataFrame, from: String, until: String): DataFrame = {
    val lo = to_timestamp(lit(from))
    val hi = to_timestamp(lit(until))
    orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Customers with their order counts and lifetime value — left outer
    * join keeps zero-order customers (count 0, value 0). */
  def customerOrderStats(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast(D18)).cast("double"), lit(0.0)).as("lifetime_value"))
      .orderBy(col("c_custkey"))

  /** Running revenue per customer over order dates — a cumulative window
    * frame. The frame sum runs over decimals so Spark's sequential
    * accumulation and DuckDB's segment-tree accumulation associate to the
    * same exact value. */
  def runningRevenue(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      sum(col("o_totalprice").cast(D18)).over(w).cast("double").as("running_revenue"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Per-user event deltas: previous/next value and inter-event gap —
    * lead/lag analytics windows. */
  def eventDeltas(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(
      col("user_id"), col("event_id"), col("ts"), col("value"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("value"), 1).over(w).as("next_value"),
      (unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))).as("ms_since_prev"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Centered-ish moving average of event values (2 preceding .. current)
    * per user — a bounded window frame; decimal-exact mean. */
  def movingAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    events.select(
      col("user_id"), col("event_id"), col("ts"),
      (sum(col("value").cast(D18)).over(w).cast("double") /
        count(lit(1)).over(w)).as("avg3"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Trailing-30-minute per-user aggregate — the RANGE (event-time) frame
    * complement to [[movingAvg]]'s ROWS frame: each event sees every
    * event of the same user within the preceding 1800 s, however many
    * that is (ClickHouse `RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW`
    * over toUnixTimestamp ordering). Frame bounds are on epoch millis;
    * timestamp ties include all peers on both engines (SQL RANGE
    * semantics), and the aggregates are an integer cent sum + count, so
    * the result is order-free and hash-exact. One user-keyed exchange. */
  def trailingWindow(events: DataFrame, minutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"))
      .rangeBetween(-(minutes * 60000L), Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_millis(col("ts")).as("tms"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("user_id"), col("event_id"), col("ts"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("cents")).over(w).as("cents_trailing"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Exact interpolated percentiles of quantity per return flag. */
  def quantityPercentiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        min(col("l_quantity")).as("qmin"),
        max(col("l_quantity")).as("qmax"))
      .orderBy(col("l_returnflag"))

  /** [[quantityPercentiles]] recomputed scalably: Spark's `percentile`
    * aggregate buffers EVERY group value on the reducer — exact, but one
    * group with billions of rows is one task's memory. This twin computes
    * the identical interpolated result by counting: reduce to
    * (group, value, cnt) — bounded by the value DOMAIN, not the row count
    * — cumulative counts over the distinct values, locate the two rows
    * bracketing the interpolation position `p·(n−1)` by conditional
    * aggregation, and interpolate with the same `lo + (hi−lo)·frac`
    * double expression. Shares q_percentiles' DuckDB `quantile_cont`
    * oracle: same values, bit-for-bit, from a plan whose per-task state
    * is O(distinct values per group). */
  def quantityPercentilesScalable(lineitem: DataFrame): DataFrame = {
    val counts = lineitem.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    // GROUPED domain-adaptive prefix sums: the (flag, quantity) domain is
    // measured — small (the sf fixtures: 3×50 rows) cumulates per flag on
    // declared tasks; wide flips to the range-partitioned stitch, which
    // spreads every flag across the range partitions where a bare
    // `Window.partitionBy(flag).orderBy(quantity)` would pin each flag's
    // whole domain to one task. Totals attach as a broadcast
    // flag-count-sized join.
    val totals = counts.groupBy(col("l_returnflag")).agg(sum(col("cnt")).as("n"))
    val cum = GlobalRank.withRunningTotalsLongAdaptive(counts, Seq("l_returnflag"),
        Seq(col("l_quantity")), Seq(col("cnt") -> "cum"))
      .join(broadcast(totals), "l_returnflag")
      .withColumn("prev", col("cum") - col("cnt"))
      .withColumn("_pos50", lit(0.5) * (col("n") - 1L).cast("double"))
      .withColumn("_pos90", lit(0.9) * (col("n") - 1L).cast("double"))
    def at(pos: Column): Column =
      max(when(col("prev") <= floor(pos) && floor(pos) < col("cum"), col("l_quantity")))
    def atHi(pos: Column): Column =
      max(when(col("prev") <= ceil(pos) && ceil(pos) < col("cum"), col("l_quantity")))
    cum.groupBy(col("l_returnflag"))
      .agg(
        at(col("_pos50")).as("_lo50"), atHi(col("_pos50")).as("_hi50"),
        at(col("_pos90")).as("_lo90"), atHi(col("_pos90")).as("_hi90"),
        max(col("_pos50")).as("_p50"), max(col("_pos90")).as("_p90"),
        min(col("l_quantity")).as("qmin"), max(col("l_quantity")).as("qmax"))
      .select(col("l_returnflag"),
        (col("_lo50") + (col("_hi50") - col("_lo50")) *
          (col("_p50") - floor(col("_p50")).cast("double"))).as("p50"),
        (col("_lo90") + (col("_hi90") - col("_lo90")) *
          (col("_p90") - floor(col("_p90")).cast("double"))).as("p90"),
        col("qmin"), col("qmax"))
      .orderBy(col("l_returnflag"))
  }

  /** Sketch-based percentiles (KLL/GK-style approx_percentile) — the
    * mergeable one-pass path that replaces [[quantityPercentiles]]' exact
    * sort-based computation at 100 TB. No SQL oracle (approximate);
    * accuracy is asserted against the exact values in tests. */
  def approxQuantityPercentiles(lineitem: DataFrame, accuracy: Int = 10000): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(l_quantity, 0.9, $accuracy)").as("p90"))
      .orderBy(col("l_returnflag"))

  /** [[approxQuantityPercentiles]] with its rank-error guarantee checked
    * in-query: emits the exact interpolated percentiles plus a verdict
    * that each sketch estimate is within `tol` of the exact value — the
    * oracle recomputes the exact side and asserts the verdict. */
  def approxQuantityPercentilesChecked(lineitem: DataFrame,
      accuracy: Int = 10000, tol: Double = 1.0): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr(s"approx_percentile(l_quantity, 0.5, $accuracy)").as("_a50"),
        expr(s"approx_percentile(l_quantity, 0.9, $accuracy)").as("_a90"))
      .select(col("l_returnflag"), col("p50"), col("p90"),
        (abs(col("_a50") - col("p50")) <= lit(tol) &&
          abs(col("_a90") - col("p90")) <= lit(tol)).as("approx_ok"))
      .orderBy(col("l_returnflag"))

  /** String-function surface: upper/substring/length/concat/LIKE. */
  def partNameStrings(part: DataFrame): DataFrame =
    part
      .filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** CASE-based value bucketing + grouped counts. */
  def valueBuckets(events: DataFrame): DataFrame =
    events
      .select(
        when(col("value") < 50, "low")
          .when(col("value") < 150, "mid")
          .otherwise("high").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** UNION ALL of two filtered legs, re-aggregated — bag semantics
    * (contrast with [[Analytics.purchasedNeverSignedUp]]'s EXCEPT). */
  def unionActivity(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("value"))
    purchases.unionAll(signups)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("user_id"))
  }

  /** Tumbling 6-hour event-time windows — the batch shape of the streaming
    * windowed aggregation ([[graft.streaming.EventStream]]). Window starts
    * are epoch-aligned in both engines. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours").getField("start").as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** Corpus token frequency: explode + lowercase + count — top 30. */
  def tokenFrequency(documents: DataFrame, topN: Int): DataFrame =
    documents
      .select(explode(split(trim(col("text")), "\\s+")).as("raw"))
      .select(lower(col("raw")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)
}
