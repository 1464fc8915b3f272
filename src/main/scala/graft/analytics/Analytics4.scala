package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Cols.{decRevenue, decSum, dsum}

/** Fourth analytics tranche: the remaining TPC-H shapes the fixtures have
  * columns for — Q8 (national market share: two-level aggregate with a
  * conditional share ratio) and Q10 (returned-items top-K: 4-way join,
  * grouped revenue, TakeOrdered). Oracle conventions as [[Analytics]]:
  * decimal-exact revenue sums, BIGINT years, deterministic total order.
  */
object Analytics4 {

  /** TPC-H Q8-shaped national market share: of all `pType` parts sold to
    * customers in region `rName` during the window, the revenue fraction
    * supplied by `shareNation`, per order year.
    *
    * Two-level aggregation: level 1 reduces lineitems to at most
    * years × nations rows with decimal-exact revenue (the proven q7
    * pattern); level 2 computes the share ratio over that tiny frame with
    * order-independent decimal sums, so the double division is bit-stable
    * on both engines. Dimensions (part filter, nation×2, region, supplier)
    * broadcast; the only data-sized exchange is level 1's group-by. */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame, part: DataFrame,
      rName: String, pType: String, shareNation: String,
      fromDate: String, toDate: String): DataFrame = {
    val cnat = nation.select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val snat = nation.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val reg = region.filter(col("r_name") === rName).select(col("r_regionkey"))
    val perNation = lineitem
      .join(broadcast(part.filter(col("p_type") === pType).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit(fromDate)) &&
          col("o_orderdate") < to_timestamp(lit(toDate)))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(cnat), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(snat), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"), col("supp_nation"))
      .agg(decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("volume"))
    perNation
      .groupBy(col("o_year"))
      .agg(
        dsum(when(col("supp_nation") === shareNation, col("volume")).otherwise(lit(0.0)))
          .as("_nat"),
        dsum(col("volume")).as("_all"))
      .select(col("o_year"), (col("_nat") / col("_all")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q17-shaped small-quantity revenue: average yearly revenue lost
    * if small orders (below 20% of a part's mean order quantity) were not
    * filled, for one brand/type segment. The correlated scalar subquery
    * (per-part average) is reformulated as a grouped frame joined back —
    * the decorrelation Catalyst would otherwise have to find, stated
    * directly; the per-part frame joins on the part key it is already
    * grouped by. Decimal-exact average (sum/count) keeps the 0.2×avg
    * threshold bit-identical on both engines. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
      brand: String, pType: String): DataFrame = {
    val parts = part
      .filter(col("p_brand") === brand && col("p_type") === pType)
      .select(col("p_partkey"))
    val avgQty = lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("avg_partkey"))
      .agg(graft.Cols.davg(col("l_quantity")).as("avg_qty"))
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((decSum(col("l_extendedprice").cast(
        org.apache.spark.sql.types.DecimalType(18, 2))) / lit(7.0)).as("avg_yearly"))
  }

  /** CUBE over (event_type, hour-of-day): all four grouping sets derived
    * by RE-AGGREGATING the finest cells instead of `cube()`'s Expand
    * (which quadruples the event rows before aggregating, one copy per
    * grouping set). One grouped pass reduces the scan to the
    * (type, hour) cells — a few hundred rows at any corpus size — and
    * the marginal/total levels re-aggregate those DECIMAL partials
    * exactly (same construction as
    * [[graft.analytics.Analytics.revenueRollup]]). */
  def cubeActivity(events: DataFrame): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 4)
    val cells = events
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hour_of_day"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(D)).as("tv"))
      .localCheckpoint() // four consumers, one event scan
    val nullType = lit(null).cast("string").as("event_type")
    val nullHour = lit(null).cast("long").as("hour_of_day")
    val byType = cells.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("tv")).as("tv"))
      .select(col("event_type"), nullHour, col("n"), col("tv"))
    val byHour = cells.groupBy(col("hour_of_day"))
      .agg(sum(col("n")).as("n"), sum(col("tv")).as("tv"))
      .select(nullType, col("hour_of_day"), col("n"), col("tv"))
    val total = cells
      .agg(sum(col("n")).as("n"), sum(col("tv")).as("tv"))
      .select(nullType, nullHour, col("n"), col("tv"))
    cells.select(col("event_type"), col("hour_of_day"), col("n"), col("tv"))
      .unionByName(byType).unionByName(byHour).unionByName(total)
      .select(col("event_type"), col("hour_of_day"), col("n"),
        col("tv").cast(org.apache.spark.sql.types.DoubleType).as("total_value"))
      .orderBy(col("event_type").asc_nulls_first, col("hour_of_day").asc_nulls_first)
  }

  /** One-row data profile of the events table — the DESCRIBE-plus
    * (row/null/distinct counts, ranges) a pipeline logs before processing.
    * Single pass; every aggregate is exact and order-free. */
  def profileEvents(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))

  /** The remaining ranking-function family over per-user spend:
    * dense_rank (no gaps), percent_rank and cume_dist (exact rationals of
    * integer ranks — deterministic doubles on both engines). Computed via
    * [[GlobalRank.withRankFamily]] — the range-partitioned construction —
    * because the "one row per user after aggregation" frame is still
    * data-sized at a billion users: the naive global window would move
    * every row to ONE task regardless of cluster size. The window ORDER BY
    * is (total_spend DESC, user_id), with peer groups defined by
    * total_spend alone (user_id is the tie-break), matching the SQL
    * window's peer semantics exactly. */
  def spendRanks(events: DataFrame): DataFrame = {
    // The rank-family construction references its input from several
    // consumers (ranks, offsets, peer frames). Checkpointing the
    // aggregated frame (|users| rows — small even at 100 TB after the
    // reduction) makes the raw-event scan+aggregation run ONCE instead of
    // once per consumer — exactly the persist-before-ranking call-out in
    // the GlobalRank scaladoc.
    val spend = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("total_spend"))
      .localCheckpoint()
    GlobalRank.withRankFamily(spend,
        valueSort = Seq(col("total_spend").desc), valueNames = Seq("total_spend"),
        tieBreak = Seq(col("user_id")))
      .select(col("user_id"), col("total_spend"),
        col("dense_rank"), col("percent_rank"), col("cume_dist"))
      .orderBy(col("user_id"))
  }

  /** Full-outer join of per-user purchase and signup activity — rows
    * survive from either side with NULL-padded counterparts, the one join
    * shape the other queries don't exercise. */
  def fullOuterActivity(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
    val signups = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_signups"))
    purchases
      .withColumnRenamed("user_id", "p_user")
      .join(signups.withColumnRenamed("user_id", "s_user"),
        col("p_user") === col("s_user"), "full_outer")
      .select(
        coalesce(col("p_user"), col("s_user")).as("user_id"),
        col("n_purchases"), col("n_signups"))
      .orderBy(col("user_id"))
  }

  /** Set intersection: users who both purchased and signed up (INTERSECT
    * distinct-set semantics on both engines). */
  def purchasedAndSignedUp(events: DataFrame): DataFrame = {
    val purchased = events.filter(col("event_type") === "purchase").select(col("user_id"))
    val signedUp = events.filter(col("event_type") === "signup").select(col("user_id"))
    purchased.intersect(signedUp).orderBy(col("user_id"))
  }

  /** TPC-H Q10-shaped returned-item report: top-`k` customers by revenue
    * from lineitems flagged returned within the window. Fact tables join
    * on their keys; the nation dim broadcasts; the top-K plans as
    * TakeOrderedAndProject over the grouped frame. */
  def returnedItems(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      nation: DataFrame, fromDate: String, toDate: String, k: Int = 20): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit(fromDate)) &&
          col("o_orderdate") < to_timestamp(lit(toDate)))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
}
