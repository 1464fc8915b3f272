package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pushes time-range predicates through the nanos→millis timestamp
  * normalization of [[graft.Tables.events]].
  *
  * The events fixture stores INT64 TIMESTAMP(NANOS), which Spark reads only
  * as a raw long; the table loader exposes
  * `ts = timestamp_millis(ts_raw div 1_000_000)`. A filter on that derived
  * column cannot reach the parquet scan — `PushedFilters` would carry only
  * the other predicates and every row group gets read, which at 100 TB is
  * the difference between a pruned scan and a full pass. This rule rewrites
  *
  *   timestamp_millis(raw div 1e6) ⋈ TIMESTAMP_LITERAL   (⋈ ∈ {<,<=,>,>=,=})
  *
  * into an exact equivalent bound on the raw nanosecond column, which then
  * pushes into the scan and prunes row groups via min/max stats. The
  * rewrite is exact (integer ceil/floor on the millisecond boundary), not a
  * best-effort residual — the original predicate is dropped.
  *
  * Registered via `spark.experimental.extraOptimizations` (idempotently, by
  * the loader), so it composes with any session the driver hands us.
  */
object NanosTimestampPushdown extends Rule[LogicalPlan] {

  private final val NsPerMs = 1000000L

  /** Matches the exact normalization expression and yields the raw column. */
  private object MsOfRaw {
    def unapply(e: Expression): Option[Expression] = e match {
      case MillisToTimestamp(d: IntegralDivide) =>
        (d.left, d.right) match {
          case (raw, Literal(NsPerMs, LongType)) if raw.dataType == LongType => Some(raw)
          case _ => None
        }
      case _ => None
    }
  }

  private def ceilDivMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
  private def floorDivMs(us: Long): Long = Math.floorDiv(us, 1000L)

  // Derivations for M = floor(raw/1e6) (the stored value in ms), against a
  // literal L in microseconds: the normalized ts is M*1000 µs.
  //   M*1000 >= L  ⟺  M >= ceil(L/1000)      ⟺ raw >= ceil(L/1000)*1e6
  //   M*1000 >  L  ⟺  M >= floor(L/1000)+1   ⟺ raw >= (floor(L/1000)+1)*1e6
  //   M*1000 <  L  ⟺  M <  ceil(L/1000)      ⟺ raw <  ceil(L/1000)*1e6
  //   M*1000 <= L  ⟺  M <= floor(L/1000)     ⟺ raw <  (floor(L/1000)+1)*1e6
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      GreaterThanOrEqual(raw, Literal(ceilDivMs(us) * NsPerMs))
    case GreaterThan(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      GreaterThanOrEqual(raw, Literal((floorDivMs(us) + 1L) * NsPerMs))
    case LessThan(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      LessThan(raw, Literal(ceilDivMs(us) * NsPerMs))
    case LessThanOrEqual(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      LessThan(raw, Literal((floorDivMs(us) + 1L) * NsPerMs))
    case EqualTo(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      if (us % 1000L == 0L) {
        val lo = (us / 1000L) * NsPerMs
        And(GreaterThanOrEqual(raw, Literal(lo)), LessThan(raw, Literal(lo + NsPerMs)))
      } else Literal.FalseLiteral
    // mirrored literal-on-the-left forms
    case GreaterThanOrEqual(l @ Literal(_: Long, TimestampType), MsOfRaw(raw)) =>
      apply0(LessThanOrEqual(MillisToTimestampOf(raw), l))
    case GreaterThan(l @ Literal(_: Long, TimestampType), MsOfRaw(raw)) =>
      apply0(LessThan(MillisToTimestampOf(raw), l))
    case LessThan(l @ Literal(_: Long, TimestampType), MsOfRaw(raw)) =>
      apply0(GreaterThan(MillisToTimestampOf(raw), l))
    case LessThanOrEqual(l @ Literal(_: Long, TimestampType), MsOfRaw(raw)) =>
      apply0(GreaterThanOrEqual(MillisToTimestampOf(raw), l))
  }

  /** Rebuilds the canonical normalization so the mirrored cases can reuse
    * the forward rewrites. */
  private def MillisToTimestampOf(raw: Expression): Expression =
    MillisToTimestamp(IntegralDivide(raw, Literal(NsPerMs)))

  private def apply0(e: Expression): Expression = e match {
    case GreaterThanOrEqual(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      GreaterThanOrEqual(raw, Literal(ceilDivMs(us) * NsPerMs))
    case GreaterThan(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      GreaterThanOrEqual(raw, Literal((floorDivMs(us) + 1L) * NsPerMs))
    case LessThan(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      LessThan(raw, Literal(ceilDivMs(us) * NsPerMs))
    case LessThanOrEqual(MsOfRaw(raw), Literal(us: Long, TimestampType)) =>
      LessThan(raw, Literal((floorDivMs(us) + 1L) * NsPerMs))
    case other => other
  }

  /** Idempotent session registration. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
}
