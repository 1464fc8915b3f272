package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols.{davg, decCharge, decRevenue, decSum, dsum}

/** Relational analytics surface: grouped aggregation, multi-way joins,
  * window functions, set ops, rollup. The reference itself issues none of
  * these (SURVEY.md §2.8 — single-table system), but the north-star
  * extension operators need them; they are expressed purely with the
  * DataFrame API so Catalyst owns pushdown, join strategy, and AQE.
  *
  * Double-typed aggregates go through [[graft.Cols.dsum]]/[[graft.Cols.davg]]
  * (decimal-exact, order-independent) so results hash-match the DuckDB
  * oracle bit-for-bit.
  */
object Analytics {

  /** TPC-H Q1-shaped pricing summary over lineitem. One shuffle on the
    * low-cardinality (returnflag, linestatus) keys; partial aggregation
    * (map-side combine) does nearly all the work before the exchange. */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(shipBefore)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        decSum(decCharge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped shipping priority: customer ⋈ orders ⋈ lineitem,
    * revenue per order, top 10. customer is small at every SF → broadcast;
    * orders⋈lineitem is the one real shuffle, on the join key. Top-10 via
    * orderBy.limit plans as TakeOrderedAndProject (no global sort). */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String, date: String): DataFrame = {
    val d = to_timestamp(lit(date))
    customer.filter(col("c_mktsegment") === segment)
      .join(orders.filter(col("o_orderdate") < d), col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped local-supplier volume: 6-way join down the
    * region→nation→customer/supplier→orders→lineitem star, grouped by
    * nation. Broadcast hints only on the fixed-cardinality dimensions
    * (region 5 rows, nation 25 rows) — customer and supplier grow with the
    * scale factor, so their join strategy is left to AQE, which broadcasts
    * them at test SF and shuffles them when they outgrow the threshold.
    * The fact-side shuffle is on orderkey only. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      regionName: String, from: String, until: String): DataFrame = {
    val lo = to_timestamp(lit(from))
    val hi = to_timestamp(lit(until))
    lineitem
      .join(orders.filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Events per type per day — grouped agg with a time bucket. */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("event_type"), col("day"))

  /** Top-k events by value per user — ranking window. The window shuffles
    * once on user_id; ties broken by event_id for determinism. */
  def topEventsPerUser(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("user_id"), col("rank"))
  }

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapMinutes`. Classic lag + conditional cumulative sum —
    * two window passes over one user_id shuffle. Returns per-session
    * bounds and event counts. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Session-length distribution: exact interpolated p50/p90 of
    * events-per-session, computed by counting over the DISTINCT length
    * values ([[Analytics2.quantityPercentilesScalable]]'s construction,
    * composed on top of [[sessionize]]): the fold reduces billions of
    * sessions to the distinct-length domain — where a
    * `percentile(n_events, …)` aggregate would buffer every session on
    * one reducer — and the cumulative count rides the domain-adaptive
    * prefix-sum pass ([[GlobalRank.withRunningTotalsLongAdaptive]]): the
    * session-length domain is measured small → one declared task; a
    * pathologically wide domain flips to the range-partitioned stitch and
    * still never lands unpartitioned on one task. The total
    * attaches as a broadcast 1-row aggregate. One global row:
    * (p50, p90, min_len, max_len, n_sessions). */
  def sessionLengthPercentiles(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val counts = sessionize(events, gapMinutes)
      .groupBy(col("n_events")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("n"))
    val cum = GlobalRank.withRunningTotalsLongAdaptive(counts, Nil,
        Seq(col("n_events")), Seq(col("cnt") -> "cum"))
      .crossJoin(broadcast(totals))
      .withColumn("prev", col("cum") - col("cnt"))
      .withColumn("_pos50", lit(0.5) * (col("n") - 1L).cast("double"))
      .withColumn("_pos90", lit(0.9) * (col("n") - 1L).cast("double"))
    def at(pos: org.apache.spark.sql.Column) =
      max(when(col("prev") <= floor(pos) && floor(pos) < col("cum"), col("n_events")))
    def atHi(pos: org.apache.spark.sql.Column) =
      max(when(col("prev") <= ceil(pos) && ceil(pos) < col("cum"), col("n_events")))
    cum.agg(
        at(col("_pos50")).as("_lo50"), atHi(col("_pos50")).as("_hi50"),
        at(col("_pos90")).as("_lo90"), atHi(col("_pos90")).as("_hi90"),
        max(col("_pos50")).as("_p50"), max(col("_pos90")).as("_p90"),
        min(col("n_events")).as("min_len"), max(col("n_events")).as("max_len"),
        sum(col("cnt")).as("n_sessions"))
      .select(
        (col("_lo50").cast("double") + (col("_hi50") - col("_lo50")).cast("double") *
          (col("_p50") - floor(col("_p50")).cast("double"))).as("p50"),
        (col("_lo90").cast("double") + (col("_hi90") - col("_lo90")).cast("double") *
          (col("_p90") - floor(col("_p90")).cast("double"))).as("p90"),
        col("min_len"), col("max_len"), col("n_sessions"))
  }

  /** Exact + approximate distinct users per event type. The exact count is
    * the oracle-checked value; approx_count_distinct (HLL++) is the one
    * that survives 100 TB and is exposed alongside. */
  def distinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  /** HLL-sketch variant of [[distinctUsers]] — no oracle (approximate). */
  def approxDistinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type"))

  /** [[approxDistinctUsers]] with its error bound checked in-query against
    * the exact count: emits the exact cardinality plus a verdict that the
    * HLL++ estimate (rsd 0.01) landed within `errBound` relative error —
    * the oracle-checkable form of an inherently approximate operator (the
    * oracle recomputes the exact side and asserts the verdict). */
  def approxDistinctUsersChecked(events: DataFrame, errBound: Double = 0.05): DataFrame =
    events
      // pre-distinct the pairs: HLL registers are duplicate-insensitive, so
      // the estimate is identical, and the mixed exact+approx aggregate no
      // longer plans as an Expand that doubles the shuffled row count —
      // instead one partial-combinable distinct then a tiny re-aggregation
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_users"),
        approx_count_distinct(col("user_id"), 0.01).as("_approx"))
      .select(col("event_type"), col("n_users"),
        (abs(col("_approx") - col("n_users")) <=
          col("n_users").cast("double") * lit(errBound)).as("approx_ok"))
      .orderBy(col("event_type"))

  /** Set difference: users who purchased but never signed up. EXCEPT has
    * distinct-set semantics in both Spark and the oracle. */
  def purchasedNeverSignedUp(events: DataFrame): DataFrame = {
    val purchased = events.filter(col("event_type") === "purchase").select(col("user_id"))
    val signedUp = events.filter(col("event_type") === "signup").select(col("user_id"))
    purchased.except(signedUp).orderBy(col("user_id"))
  }

  /** ROLLUP over (returnflag, linestatus) — grouping-set aggregation,
    * computed by RE-AGGREGATING PARTIALS instead of `rollup()`'s Expand:
    * the built-in operator triples the fact rows through Expand before
    * aggregating (one copy per grouping set), while every coarser level
    * here derives exactly from the finest (flag, status) cells. One
    * grouped aggregation reduces the fact scan to ~|flags×statuses| rows;
    * the (flag) and grand-total levels re-aggregate those DECIMAL
    * partials (decimal addition is exact, so the final double cast is
    * bit-identical to the direct rollup's) — at 100 TB this is the
    * difference between shuffling 3× the fact table and shuffling six
    * rows. */
  def revenueRollup(lineitem: DataFrame): DataFrame = {
    val cells = lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("rev"),
        count(lit(1)).as("n"))
      .localCheckpoint() // three consumers, one fact scan
    val byFlag = cells.groupBy(col("l_returnflag"))
      .agg(sum(col("rev")).as("rev"), sum(col("n")).as("n"))
      .select(col("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"), col("rev"), col("n"))
    val total = cells
      .agg(sum(col("rev")).as("rev"), sum(col("n")).as("n"))
      .select(lit(null).cast("string").as("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"), col("rev"), col("n"))
    cells.select(col("l_returnflag"), col("l_linestatus"), col("rev"), col("n"))
      .unionByName(byFlag).unionByName(total)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("rev").cast(org.apache.spark.sql.types.DoubleType).as("revenue"),
        col("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** As-of join: for each event, that user's latest order at-or-before the
    * event ts. Spark has no ASOF JOIN operator; the scalable expression is
    * the union-marker technique — tag both sides, union, one shuffle+sort
    * on (key, ts), and carry the last order forward with
    * last(ignoreNulls) — instead of the naive range join + per-key max,
    * whose intermediate pair count is quadratic in rows-per-user.
    *
    * Orders are first reduced to one row per (custkey, orderdate) (max
    * orderkey wins) so tie behavior at equal ts is well-defined on both
    * engines.
    */
  /** [[lastOrderBeforeEvent]] via the dedicated physical operator
    * ([[graft.plans.AsOfJoin]]): same semantics and oracle, executed as a
    * co-partitioned sort-merge walk instead of a window over a union. */
  def lastOrderBeforeEventExec(spark: org.apache.spark.sql.SparkSession,
      events: DataFrame, orders: DataFrame): DataFrame = {
    val o = orders
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    val e = events.select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoin.asofJoin(spark, e, o,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id"))
  }

  def lastOrderBeforeEvent(events: DataFrame, orders: DataFrame): DataFrame = {
    val o = orders
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("okey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("oprice"))
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        lit(0).as("side"), col("okey"), col("oprice"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("timestamp").as("ts"))
    val e = events
      .select(col("user_id").as("k"), col("ts").as("t"),
        lit(1).as("side"), lit(null).cast("long").as("okey"),
        lit(null).cast("double").as("oprice"),
        col("event_id"), col("ts"))
    // Orders sort before events at equal t (side 0 < 1), so an order placed
    // exactly at the event ts is visible to it — matching `o.date <= e.ts`.
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("o_orderkey", last(col("okey"), ignoreNulls = true).over(w))
      .withColumn("o_totalprice", last(col("oprice"), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("o_orderkey").isNotNull)
      .select(col("event_id"), col("k").as("user_id"), col("ts"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id"))
  }
}
