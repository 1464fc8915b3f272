package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4's unified `Column` wraps a ColumnNode rather than an Expression,
  * and the conversion helpers (`classic.ExpressionUtils`) are
  * `private[sql]`; extension libraries conventionally expose them through a
  * small shim in the `org.apache.spark.sql` package. This is the only file
  * outside the `graft` namespace.
  */
object GraftGlue {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Decompose a sort Column (`col.asc` / `col.desc`) into its child
    * Column and direction (true = ascending). Plain columns return None.
    * Sort columns carry an `internal.SortOrder` COLUMN NODE (not a
    * catalyst SortOrder), so callers cannot detect them via
    * `toExpression` pattern matches. */
  def sortOrderParts(c: Column): Option[(Column, Boolean)] = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      Some((Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Ascending))
    case _ => None
  }

  /** Wrap a logical plan as a DataFrame (classic `Dataset.ofRows`). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
}
