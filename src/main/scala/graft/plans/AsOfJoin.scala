package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftGlue, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** As-of join as a first-class operator: LogicalPlan + Strategy +
  * sort-merge SparkPlan (SURVEY §7.3 tier (c) — whole-operator semantics
  * Spark's built-ins don't express directly).
  *
  * Semantics: for every left row, attach the single right row with the
  * same key and the greatest `rightTime <= leftTime` (inner: left rows
  * with no such match are dropped). Equivalent to DuckDB's
  * `ASOF JOIN ... ON l.k = r.k AND r.t <= l.t`.
  *
  * Physical execution: both sides hash-clustered on the key and sorted by
  * (key, time) — the engine's own Exchange/Sort machinery satisfies the
  * requirements, so AQE, whole-stage-codegen'd children, and reuse all
  * compose. Each task then runs a single forward merge walk: O(n+m) per
  * partition, one buffered row of state (the current best match), no
  * pair blow-up — the property that makes the operator safe when one user
  * has millions of events at 100 TB. Contrast with the union-marker
  * expression of the same semantics
  * ([[graft.analytics.Analytics.lastOrderBeforeEvent]]), which pays a
  * window over the unioned stream; this operator joins the sides directly.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)) ::
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (leftIter, rightIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val project = UnsafeProjection.create(outputAttrs, outputAttrs)
        private val rBuf = rightIter.buffered

        // current best match: right row (copied) for (curKey) with max
        // time <= the left row's time, maintained by the forward walk
        private var candKey = 0L
        private var cand: InternalRow = _

        private var nextRow: InternalRow = _

        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && leftIter.hasNext) {
            val l = leftIter.next()
            val k = lKey.eval(l).asInstanceOf[Long]
            val t = lTime.eval(l).asInstanceOf[Long]
            // drop the candidate when the key moves on
            if (cand != null && candKey != k) cand = null
            // pull right rows while they are <= (k, t)
            var continue = true
            while (continue && rBuf.hasNext) {
              val r = rBuf.head
              val rk = rKey.eval(r).asInstanceOf[Long]
              val rt = rTime.eval(r).asInstanceOf[Long]
              if (rk < k || (rk == k && rt <= t)) {
                if (rk == k) { cand = r.copy(); candKey = k }
                rBuf.next()
              } else continue = false
            }
            if (cand != null && candKey == k) {
              nextRow = project(joined(l, cand))
            }
          }
        }

        // Lazy volcano contract: advance only when the consumer asks for
        // the next row — the projection reuses its output buffer, so
        // computing ahead would clobber the row just handed out.
        override def hasNext: Boolean = {
          if (nextRow == null) advance()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (nextRow == null) advance()
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Idempotent strategy registration on an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  /** DataFrame API: for each `left` row, the latest `right` row with equal
    * key and `rightTime <= leftTime`; inner semantics. Key/time columns are
    * named and resolved against each side's analyzed output directly (a
    * Spark 4 `Column` wraps an unresolved ColumnNode the analyzer only
    * rewrites inside built-in operators). Keys and times must be
    * long-backed (bigint keys, timestamp columns) — the fixture surface;
    * widening to arbitrary orderable types means swapping the eval casts
    * for ordering comparators. */
  def asofJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTime: String, rightTime: String): DataFrame = {
    install(spark)
    val lp = GraftGlue.logicalPlan(left)
    val rp = GraftGlue.logicalPlan(right)
    def attr(p: LogicalPlan, name: String): Expression =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in [${p.output.map(_.name).mkString(", ")}]"))
    val plan = AsOfJoinPlan(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTime), attr(rp, rightTime))
    GraftGlue.ofRows(spark, plan)
  }
}
