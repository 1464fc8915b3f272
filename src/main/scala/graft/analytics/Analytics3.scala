package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols.dsum

/** Third analytics tranche: reshaping and time-profile operators —
  * pivot, ntile, time-of-day profiles, sliding windows, regexp
  * extraction. Same oracle conventions as [[Analytics]]. */
object Analytics3 {

  /** Daily counts pivoted to one column per event type. Explicit value
    * list (required for deterministic output schema — and at scale a
    * wildcard pivot would collect the distinct values to the driver). */
  def dailyTypePivot(events: DataFrame, types: Seq[String]): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("day"))

  /** Quartile assignment of users by total spend — NTILE ranking, computed
    * by [[GlobalRank.withNtile]] (range-repartition + per-partition offsets)
    * instead of `ntile().over(Window.orderBy(...))`, whose empty partition
    * spec funnels every row through one task. */
  def spendQuartiles(events: DataFrame): DataFrame = {
    val spend = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("total_spend"))
    GlobalRank.withNtile(spend, 4, Seq(col("total_spend").desc, col("user_id").asc), "quartile")
      .orderBy(col("quartile"), col("user_id"))
  }

  /** Hour-of-day × type activity profile. */
  def hourlyProfile(events: DataFrame): DataFrame =
    events
      .groupBy(hour(col("ts")).cast("long").as("hour_of_day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("hour_of_day"), col("event_type"))

  /** Sliding event-time windows (1 h length, 30 min slide): every event
    * lands in two overlapping windows. Built-in `window()` generates the
    * window set per row — no self-join. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").getField("start").as("w_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("w_start"), col("event_type"))

  /** TPC-H Q7-shaped bi-national trade volume: revenue shipped between two
    * nations per year, in both directions. The nation dimension joins in
    * twice under different roles (supplier's vs customer's nation) — a
    * dimension self-alias pattern; both alias sides broadcast. */
  def nationTrade(nation: DataFrame, supplier: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame, nationA: String, nationB: String): DataFrame = {
    val n1 = nation.select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = nation.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(
        (col("supp_nation") === nationA && col("cust_nation") === nationB) ||
          (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(graft.Cols.decSum(
        graft.Cols.decRevenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Gap-based sessions via the built-in `session_window` function — the
    * declarative alternative to [[Analytics.sessionize]]'s lag+cumsum.
    * Boundary note: session_window starts a new session when the gap is
    * *reached* (t − prev ≥ gap); the lag+cumsum version (and the oracle)
    * only when *exceeded* (t − prev > gap). With ms-precision timestamps
    * the two coincide under gap+1ms, so that is the window length used.
    * Same output shape and oracle as q_sessionize. */
  def sessionWindows(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes 1 millisecond").as("w"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("session_id", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("session_id"), col("session_start"),
        col("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Latest event per user via `max_by` with a struct ordering key —
    * the aggregation-based "latest row" pattern. Unlike the equivalent
    * ROW_NUMBER()=1 window (which shuffles every row), max_by reduces each
    * key to one row in the map-side partial aggregate, so the exchange
    * carries |users| rows regardless of history depth. Ties broken by
    * event_id through the struct's lexicographic order. */
  def latestEventPerUser(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("ts"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"), col("m.ts").as("ts"),
        col("m.event_type").as("event_type"), col("m.value").as("value"))
      .orderBy(col("user_id"))

  /** Leading-word extraction over documents — regexp surface. Empty string
    * on no match (both engines). */
  def leadingWords(documents: DataFrame): DataFrame =
    documents
      .select(regexp_extract(col("text"), "^\\s*([a-z]+)", 1).as("first_word"))
      .groupBy(col("first_word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("first_word"))
      .limit(20)
}
