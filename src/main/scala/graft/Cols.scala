package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Column helpers shared across operators.
  *
  * `dsum`/`davg` exist for DuckDB-oracle determinism: summing doubles is
  * order-dependent, and Spark's parallel partial aggregation visits rows in
  * a different order than DuckDB's scan, so raw `sum(double)` differs in the
  * last ulps and fails a hash compare. Casting each value to DECIMAL(18,4)
  * *before* the sum makes the aggregate exact and associative (the per-row
  * double→decimal rounding is deterministic), then one final cast back to
  * double is again deterministic. The oracle SQL mirrors the same shape:
  * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  */
object Cols {
  private val D = DecimalType(18, 4)

  /** Order-independent double sum (see object doc). Safe on *raw* data
    * columns (at most 2 decimal digits by construction, so the per-row
    * double→decimal rounding can never sit on a half-ulp boundary); for
    * products of columns use [[decRevenue]]/[[decCharge]]-style full
    * decimal arithmetic instead — a computed double can land close enough
    * to a .00005 boundary that Spark (shortest-repr BigDecimal) and DuckDB
    * (exact-binary) round differently. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Order-independent double avg: exact decimal sum, then double divide. */
  def davg(c: Column): Column = sum(c.cast(D)).cast(DoubleType) / count(lit(1))

  /** Oracle-side SQL fragment matching [[dsum]]. */
  def dsumSql(x: String): String = s"CAST(SUM(CAST(($x) AS DECIMAL(18,4))) AS DOUBLE)"

  /** Oracle-side SQL fragment matching [[davg]]. */
  def davgSql(x: String): String = s"CAST(SUM(CAST(($x) AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"

  // ── exact decimal arithmetic for the TPC-H price expressions ──
  // Inputs are 2-decimal money/rate columns; cast them to decimal FIRST
  // (boundary-free), then multiply in decimal (exact), sum (exact), and
  // cast the final aggregate to double (deterministic). Mirrored 1:1 by
  // the *Sql fragments below so DuckDB computes the identical value.

  private val D18 = DecimalType(18, 2)
  private val D4 = DecimalType(4, 2)

  /** extendedprice · (1 − discount), exact decimal. */
  def decRevenue(price: Column, discount: Column): Column =
    price.cast(D18) * (lit(1.0) - discount).cast(D4)

  /** extendedprice · (1 − discount) · (1 + tax), exact decimal. */
  def decCharge(price: Column, discount: Column, tax: Column): Column =
    decRevenue(price, discount) * (lit(1.0) + tax).cast(D4)

  /** Exact-decimal sum emitted as double. */
  def decSum(c: Column): Column = sum(c).cast(DoubleType)

  def decRevenueSql(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(18,2)) * CAST(1.0 - $discount AS DECIMAL(4,2))"

  def decChargeSql(price: String, discount: String, tax: String): String =
    s"${decRevenueSql(price, discount)} * CAST(1.0 + $tax AS DECIMAL(4,2))"

  /** extendedprice · discount, exact decimal (TPC-H Q6/Q14 shape). */
  def decDiscounted(price: Column, discount: Column): Column =
    price.cast(D18) * discount.cast(D4)

  def decDiscountedSql(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(18,2)) * CAST($discount AS DECIMAL(4,2))"

  def decSumSql(x: String): String = s"CAST(SUM($x) AS DOUBLE)"
}
