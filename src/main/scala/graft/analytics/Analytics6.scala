package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Cols.{decRevenue, decSum, dsum}

/** Sixth analytics tranche: TPC-H shapes Q15/Q16/Q18/Q19/Q20/Q21 adapted
  * to the fixture's reduced schema (conventions and schema adaptations as
  * [[Analytics5]]). These cover the join-shape checklist the earlier
  * tranches don't: left-anti (Q16's NOT IN), left-semi on an aggregated
  * subquery (Q18, Q20), a scalar MAX subquery (Q15), disjunctive
  * multi-column predicates (Q19), and the EXISTS / NOT-EXISTS pair (Q21)
  * reformulated as per-group counting.
  */
object Analytics6 {

  /** TPC-H Q15 top supplier: per-supplier revenue for one quarter, keep
    * the supplier(s) achieving the maximum. The MAX is a one-row aggregate
    * of the per-supplier frame broadcast back (same decorrelation shape as
    * [[Analytics5.importantParts]]); supplier dim broadcasts. */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
      from: String, until: String): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(from)) &&
        col("l_shipdate") < to_timestamp(lit(until)))
      .groupBy(col("l_suppkey"))
      .agg(decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("_max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("_max_rev"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 part/supplier counts: distinct suppliers per
    * (brand, type, size) over the lineitem-derived part↔supplier relation,
    * excluding one brand/type and suppliers with negative balance (the
    * "customer complaints" slot) via LEFT ANTI — the NOT IN is safe to
    * plan as a plain anti join because both key sides are non-null. */
  def partSupplierCounts(part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      excludeBrand: String, excludeType: String, sizes: Seq[Int]): DataFrame =
    lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(part
          .filter(col("p_brand") =!= excludeBrand && col("p_type") =!= excludeType &&
            col("p_size").isin(sizes: _*))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** TPC-H Q18 large-volume customers: orders whose total quantity exceeds
    * `qtyThreshold`. The HAVING subquery and the outer re-aggregation
    * collapse into one grouped frame (order totals), because every outer
    * group key is functionally determined by the order key — stated
    * directly instead of leaving Catalyst to dedupe the double scan the
    * SQL formulation implies. Top-K by totalprice plans as TakeOrdered. */
  def largeVolumeCustomers(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      qtyThreshold: Double, k: Int = 100): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > qtyThreshold)
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice")), col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** TPC-H Q19 disjunctive-predicate revenue: three (brand, size-range,
    * quantity-range) OR branches evaluated after the part broadcast join.
    * The common `p_partkey = l_partkey` conjunct stays a hash-join key;
    * only the residual disjunction runs as a post-join filter — the plan
    * shape that keeps Q19 out of nested-loop territory. */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame,
      branches: Seq[(String, Int, Int, Double, Double)]): DataFrame = {
    val cond = branches.map { case (brand, szLo, szHi, qLo, qHi) =>
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) && col("l_quantity").between(qLo, qHi)
    }.reduce(_ || _)
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(decSum(decRevenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
  }

  /** TPC-H Q20-shaped part-promotion suppliers: suppliers that shipped
    * more than `fraction` of some `pType` part's total volume in the
    * window. The availqty comparison becomes a share-of-part-total test on
    * the shipped frame; qualification is one LEFT SEMI join on suppkey.
    * Both aggregates reuse the same (partkey, suppkey) grouped frame. */
  def partPromotionSuppliers(supplier: DataFrame, part: DataFrame, lineitem: DataFrame,
      pType: String, from: String, until: String, fraction: Double): DataFrame = {
    val shipped = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(from)) &&
        col("l_shipdate") < to_timestamp(lit(until)))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("qty"))
    val perPart = shipped.groupBy(col("l_partkey").as("pp_key"))
      .agg(dsum(col("qty")).as("total_qty"))
    val qualified = shipped
      .join(perPart, col("l_partkey") === col("pp_key"))
      .join(broadcast(part.filter(col("p_type") === pType).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .filter(col("qty") > col("total_qty") * fraction)
      .select(col("l_suppkey"))
    supplier
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** TPC-H Q21-shaped waiting-suppliers report: for 'F'-status orders,
    * count late lines (shipped ≥ `lateDays` after order date) whose
    * supplier was the ONLY late supplier on a multi-supplier order. The
    * EXISTS ("another supplier on the order") and NOT EXISTS ("another
    * late supplier") subqueries are reformulated as one per-(order,
    * supplier) flag frame plus per-order counts — two grouped aggregates
    * on the same orderkey shuffle instead of two correlated rescans:
    * qualify when n_suppliers > 1 ∧ n_late_suppliers = 1 ∧ self late. */
  def waitingSuppliers(supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      lateDays: Int, k: Int = 100): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")
    val lo = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("is_late"))
    val pairFlags = lo.groupBy(col("l_orderkey").as("po_key"), col("l_suppkey").as("po_supp"))
      .agg(max(when(col("is_late"), 1L).otherwise(0L)).as("supp_late"))
    val perOrder = pairFlags.groupBy(col("po_key"))
      .agg(count(lit(1)).as("n_supp"), sum(col("supp_late")).as("n_late"))
    lo.filter(col("is_late"))
      .join(perOrder, col("l_orderkey") === col("po_key"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }
}
