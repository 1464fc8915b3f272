package graft.plans

import java.time.ZoneId

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Pushes time-range predicates through the millisecond normalization of
  * [[graft.Tables.events]], whichever physical shape the fixture ships.
  *
  * The loader exposes `ts` truncated to milliseconds (the reference's
  * `DateTime64(3)` precision). A filter on that DERIVED column cannot reach
  * the parquet scan — `PushedFilters` would carry only the other predicates
  * and every row group gets read, which at 100 TB is the difference between
  * a pruned scan and a full pass. This rule rewrites
  *
  *   normalized(ts_raw) ⋈ TIMESTAMP_LITERAL      (⋈ ∈ {<, <=, >, >=, =})
  *
  * into an exact equivalent bound on the raw scan column, which then pushes
  * into the scan and prunes row groups via min/max stats. The rewrite is
  * exact (integer ceil/floor on the millisecond boundary), not a
  * best-effort residual — the original predicate is dropped. Three
  * normalization shapes are recognized, mirroring [[graft.Tables.events]]:
  *
  *  1. nanos fixture (rounds 1-5): `timestamp_millis(ts_long div 1e6)` —
  *     bounds are emitted on the raw nanosecond Long.
  *  2. micros fixture (round 6+, isAdjustedToUTC=false):
  *     `date_trunc('millisecond', cast(ts_ntz as timestamp))` (the cast is
  *     analyzer-inserted) — bounds are emitted as TIMESTAMP_NTZ literals on
  *     the raw column, shifted by the session zone's fixed offset. Guarded
  *     on a fixed-offset session zone (UTC in every session we build): a
  *     DST zone's wall↔instant map is non-injective and the rewrite would
  *     not be exact.
  *  3. micros, isAdjustedToUTC=true: `date_trunc('millisecond', ts)` —
  *     bounds on the raw TimestampType column (ms truncation never crosses
  *     a zone offset, which is always whole seconds, so no zone guard is
  *     needed).
  *
  * All five comparison shapes reduce to two primitives on the raw column —
  * `raw >= msBound` and `raw < msBound` — derived for the stored value
  * `M*1ms = floor(raw/1ms)*1ms` against a literal `L` µs:
  *
  *   M*1ms >= L  ⟺  raw >= ceil(L/1ms)*1ms
  *   M*1ms >  L  ⟺  raw >= (floor(L/1ms)+1)*1ms
  *   M*1ms <  L  ⟺  raw <  ceil(L/1ms)*1ms
  *   M*1ms <= L  ⟺  raw <  (floor(L/1ms)+1)*1ms
  *   M*1ms  = L  ⟺  L on a ms boundary ? raw ∈ [L, L+1ms) : false
  *
  * Registered via `spark.experimental.extraOptimizations` (idempotently, by
  * the loader), so it composes with any session the driver hands us; those
  * run after the main optimizer batches and before physical planning, where
  * the V1 parquet source collects its pushable filters.
  */
object NanosTimestampPushdown extends Rule[LogicalPlan] {

  private final val NsPerMs = 1000000L
  private final val UsPerMs = 1000L

  /** Overflow-safe ceiling: `floorDiv(us + 999, 1000)` would wrap for
    * literals within 999µs of Long.MaxValue and silently invert the
    * rewritten bound; div-then-adjust is exact over the full Long range. */
  private def ceilMs(us: Long): Long =
    Math.floorDiv(us, UsPerMs) + (if (Math.floorMod(us, UsPerMs) == 0L) 0L else 1L)
  private def floorMs(us: Long): Long = Math.floorDiv(us, UsPerMs)

  /** The millisecond-truncation format literal of `date_trunc`. */
  private object MsFormat {
    def unapply(e: Expression): Boolean = e match {
      case Literal(s: UTF8String, StringType) =>
        val f = s.toString.toUpperCase(java.util.Locale.ROOT)
        f == "MILLISECOND" || f == "MILLISECONDS" || f == "MS"
      case _ => false
    }
  }

  /** Matches any loader-emitted ms normalization and yields the two bound
    * builders (`geMs`, `ltMs`): given a millisecond ordinal, each emits the
    * equivalent `raw >= bound` / `raw < bound` predicate in the raw
    * column's own type and time domain.
    */
  private object NormalizedTs {
    def unapply(e: Expression): Option[(Long => Expression, Long => Expression)] = e match {
      // shape 1: timestamp_millis(raw_nanos div 1e6)
      case MillisToTimestamp(d: IntegralDivide) =>
        (d.left, d.right) match {
          case (raw, Literal(NsPerMs, LongType)) if raw.dataType == LongType =>
            Some((
              ms => GreaterThanOrEqual(raw, Literal(ms * NsPerMs)),
              ms => LessThan(raw, Literal(ms * NsPerMs))))
          case _ => None
        }
      case t: TruncTimestamp if MsFormat.unapply(t.format) =>
        t.timestamp match {
          // shape 2: date_trunc('millisecond', cast(raw_ntz as timestamp))
          case c: Cast if c.dataType == TimestampType &&
              c.child.dataType == TimestampNTZType && fixedOffsetUs(c.timeZoneId).isDefined =>
            val off = fixedOffsetUs(c.timeZoneId).get
            val raw = c.child
            Some((
              ms => GreaterThanOrEqual(raw, Literal(ms * UsPerMs + off, TimestampNTZType)),
              ms => LessThan(raw, Literal(ms * UsPerMs + off, TimestampNTZType))))
          // shape 3: date_trunc('millisecond', raw_tz)
          case raw if raw.dataType == TimestampType =>
            Some((
              ms => GreaterThanOrEqual(raw, Literal(ms * UsPerMs, TimestampType)),
              ms => LessThan(raw, Literal(ms * UsPerMs, TimestampType))))
          case _ => None
        }
      case _ => None
    }
  }

  /** Session zone's offset in µs, defined only for fixed-offset zones
    * (instant→wall is then an exact order-preserving bijection). */
  private def fixedOffsetUs(zid: Option[String]): Option[Long] =
    zid.flatMap { z =>
      val rules = ZoneId.of(z).getRules
      if (rules.isFixedOffset)
        Some(rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds * 1000000L)
      else None
    }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(us: Long, TimestampType) => Some(us)
      case _ => None
    }
  }

  private def eqRewrite(ge: Long => Expression, lt: Long => Expression, us: Long): Expression =
    if (us % UsPerMs == 0L) {
      val ms = us / UsPerMs
      And(ge(ms), lt(ms + 1L))
    } else Literal.FalseLiteral

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(NormalizedTs(ge, _), TsLit(us)) => ge(ceilMs(us))
    case GreaterThan(NormalizedTs(ge, _), TsLit(us)) => ge(floorMs(us) + 1L)
    case LessThan(NormalizedTs(_, lt), TsLit(us)) => lt(ceilMs(us))
    case LessThanOrEqual(NormalizedTs(_, lt), TsLit(us)) => lt(floorMs(us) + 1L)
    case EqualTo(NormalizedTs(ge, lt), TsLit(us)) => eqRewrite(ge, lt, us)
    // mirrored literal-on-the-left forms
    case GreaterThanOrEqual(TsLit(us), NormalizedTs(_, lt)) => lt(floorMs(us) + 1L) // L >= N ⟺ N <= L
    case GreaterThan(TsLit(us), NormalizedTs(_, lt)) => lt(ceilMs(us)) //              L >  N ⟺ N <  L
    case LessThan(TsLit(us), NormalizedTs(ge, _)) => ge(floorMs(us) + 1L) //           L <  N ⟺ N >  L
    case LessThanOrEqual(TsLit(us), NormalizedTs(ge, _)) => ge(ceilMs(us)) //          L <= N ⟺ N >= L
    case EqualTo(TsLit(us), NormalizedTs(ge, lt)) => eqRewrite(ge, lt, us)
  }

  /** Idempotent session registration. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
}
