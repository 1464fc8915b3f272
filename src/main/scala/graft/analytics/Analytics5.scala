package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Cols.{davg, decDiscounted, decRevenue, decSum, dsum}

/** Fifth analytics tranche: TPC-H shapes Q2/Q6/Q9/Q11/Q12/Q13/Q14 adapted
  * to the fixture's reduced star schema (no `partsupp`, no comment or
  * commit/receipt-date columns — see SURVEY.md §2.8; the reference itself
  * is a single-table system, these are north-star extension operators).
  * Where classic TPC-H reads `partsupp`, the part↔supplier relation is
  * derived as `SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`; where
  * it reads receipt/commit dates, lateness is `l_shipdate` vs
  * `o_orderdate + N days`.
  *
  * Oracle conventions as [[Analytics]]: decimal-exact money arithmetic
  * ([[graft.Cols]]), BIGINT counts/years, deterministic total order.
  */
object Analytics5 {

  /** TPC-H Q2-shaped minimum-balance supplier: for every part of one
    * size/type segment, the region's supplier(s) with the lowest account
    * balance among those that have actually shipped the part. The
    * correlated `MIN` subquery is decorrelated by construction: the
    * candidate frame is built once, its per-part minimum is a grouped
    * aggregate on the frame's own grouping key, and the equality join back
    * is on that same key — no re-scan, no nested loop. Dimension joins
    * (nation, region, the size/type part slice) broadcast; the only
    * data-sized exchanges are the DISTINCT on the derived part↔supplier
    * relation and its per-part min. */
  def minBalanceSupplier(region: DataFrame, nation: DataFrame, supplier: DataFrame,
      part: DataFrame, lineitem: DataFrame,
      rName: String, size: Int, pType: String, k: Int = 100): DataFrame = {
    val ps = lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
    val cand = ps
      .join(broadcast(part.filter(col("p_size") === size && col("p_type") === pType)
          .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === rName).select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
    val minBal = cand.groupBy(col("p_partkey").as("min_pk"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    cand
      .join(minBal, col("p_partkey") === col("min_pk") && col("s_acctbal") === col("min_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_type"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(k)
  }

  /** TPC-H Q6 forecast-revenue change: one scan, every predicate pushed to
    * parquet (ts range + two numeric ranges), one decimal-exact global
    * aggregate — the canonical "filter reaches the scan" query. */
  def forecastRevenue(lineitem: DataFrame, from: String, until: String,
      discLo: Double, discHi: Double, qtyMax: Double): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(from)) &&
        col("l_shipdate") < to_timestamp(lit(until)) &&
        col("l_discount") >= discLo && col("l_discount") <= discHi &&
        col("l_quantity") < qtyMax)
      .agg(decSum(decDiscounted(col("l_extendedprice"), col("l_discount"))).as("revenue"))

  /** TPC-H Q9-shaped product-type profit by supplier nation and year.
    * Without `partsupp.ps_supplycost`, unit cost is proxied by
    * `p_retailprice` (the one per-part money column): profit =
    * revenue − retailprice·quantity, exact decimal throughout. Part-name
    * token filter broadcasts; the fact joins shuffle on their keys only. */
  def productProfit(nation: DataFrame, supplier: DataFrame, part: DataFrame,
      orders: DataFrame, lineitem: DataFrame, nameToken: String): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_name").contains(nameToken))
          .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(decSum(
        decRevenue(col("l_extendedprice"), col("l_discount")) -
          col("p_retailprice").cast(DecimalType(18, 2)) * col("l_quantity").cast(DecimalType(18, 2)))
        .as("profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q11-shaped important-part value: parts whose shipped value from
    * one nation's suppliers exceeds `fraction` of that nation's total. The
    * scalar total is a one-row aggregate of the (already tiny) per-part
    * frame, broadcast back — the whole "HAVING > scalar subquery" shape
    * costs one extra one-row exchange, not a rescan. */
  def importantParts(nation: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      nName: String, fraction: Double): DataFrame = {
    val supN = supplier
      .join(broadcast(nation.filter(col("n_name") === nName).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = lineitem
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("value"))
    val total = value.agg(dsum(col("value")).as("_total"))
    value.crossJoin(broadcast(total))
      .filter(col("value") > col("_total") * fraction)
      .select(col("l_partkey"), col("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q12-shaped shipping-speed priority split. Without commit /
    * receipt dates, a line is SLOW when it shipped ≥ `lateDays` after the
    * order date. Counts high- vs low-priority lines per speed class —
    * conditional aggregation over one fact-fact join keyed on orderkey. */
  def shipSpeedPriority(orders: DataFrame, lineitem: DataFrame,
      from: String, until: String, lateDays: Int): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(from)) &&
        col("l_shipdate") < to_timestamp(lit(until)))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        when(col("l_shipdate") >= col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), "SLOW")
          .otherwise("FAST").as("ship_speed"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy(col("ship_speed"))

  /** TPC-H Q13 customer order-count distribution: LEFT OUTER join with an
    * extra join-side predicate (the classic "not like '%special
    * requests%'" slot, here an order-priority exclusion), then a
    * two-level aggregate — count per customer, histogram over counts.
    * `count(o_orderkey)` counts matched rows only, so never-matched
    * customers land in the 0 bucket exactly as SQL's COUNT(col). */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame,
      excludePriority: String): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q14 promo-revenue share: conditional decimal aggregate over one
    * month's lineitems joined to the (broadcast) part dimension. The CASE
    * zeroes the *price input* before the decimal multiply so both branches
    * stay in exact decimal arithmetic and the final percentage is one
    * deterministic double division. */
  def promoRevenue(lineitem: DataFrame, part: DataFrame,
      from: String, until: String, promoType: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(from)) &&
        col("l_shipdate") < to_timestamp(lit(until)))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        decSum(decRevenue(
          when(col("p_type") === promoType, col("l_extendedprice")).otherwise(lit(0.0)),
          col("l_discount"))).as("_promo"),
        decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("_all"))
      .select((lit(100.0) * col("_promo") / col("_all")).as("promo_revenue"))

  /** TPC-H Q22-shaped idle-rich-customers report, adapted to a schema
    * where every customer has *some* order: the anti-join target is
    * "no order since `sinceDate`" (lapsed customers) instead of "no order
    * ever", keeping the NULL-free anti-join non-vacuous. The average
    * balance is a decimal-exact scalar broadcast back; the anti join
    * shuffles on custkey only. */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
      segments: Seq[String], sinceDate: String): DataFrame = {
    val segs = customer
      .filter(col("c_mktsegment").isin(segments: _*))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val avgBal = segs.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("_avg_bal"))
    segs.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("_avg_bal"))
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit(sinceDate)))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }
}
