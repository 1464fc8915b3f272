package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators over the event stream — custom per-key
  * state via `flatMapGroupsWithState`, the tier below built-in windowed
  * aggregation (SURVEY §2.6 extension surface).
  */
object StatefulOps {

  final case class EventIn(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Per-user open-session state (public: the state encoder's generated
    * code constructs it reflectively). */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Streaming gap-based sessionization: a user's session closes when no
    * event arrives within `gapMinutes` of the previous one. Event-time
    * timeouts — a session whose gap deadline falls behind the watermark is
    * finalized and its state dropped, so emission is deterministic (driven
    * by the data's own clock, not wall time) and the state store stays
    * proportional to *active* users. Streaming counterpart of
    * [[graft.analytics.Analytics.sessionize]].
    *
    * Callers must put a watermark on `ts` before calling (the test/driver
    * path does); `flatMapGroupsWithState` requires it for
    * EventTimeTimeout.
    */
  def sessionize(events: Dataset[EventIn], gapMinutes: Int,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // finalize when the watermark passes the gap deadline
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  final case class FunnelOut(user_id: Long, completed_at: Timestamp, duration_ms: Long)

  /** Per-user funnel progress: `step` = index of the NEXT awaited step
    * (−1 = completed marker, −2 = failed marker), `stepTs` = completion
    * time of the previous step (or the terminal event for markers),
    * `startTs` = step-0 time. Public for the state encoder. */
  final case class FunnelState(step: Int, stepTs: Long, startTs: Long)

  /** Streaming funnel: emit one `(user, completed_at, duration)` row the
    * moment a user finishes `steps` in order, each step inside
    * `horizonHours` of the previous — the real-time twin of
    * [[graft.analytics.Behavior.funnelCounts]]' final-step count.
    *
    * State machine per user (events processed in event-time order within
    * each batch): the first `steps(0)` event EVER starts the user's one
    * chain; the first qualifying event of each awaited step advances it
    * (first-qualifying = earliest under in-order delivery, matching the
    * batch min-ts chain). A chain whose step window passes the watermark
    * can never legally advance — it transitions to a permanent FAILED
    * marker rather than restarting on a later step-0 event, and a
    * completed chain leaves a COMPLETED marker: both pin the batch
    * funnel's strict first-occurrence semantics, so completions equal the
    * batch final-step count EXACTLY and independently of micro-batch
    * boundaries (the streaming soak asserts this at 10× users).
    *
    * The honest cost of exact first-touch attribution is marker
    * retention: markers hold state `retentionHours` (default one year)
    * past their terminal event, after which a RETURNING user is treated
    * as new — the standard TTL'd-identity compromise; active chains
    * themselves expire with their step window, so live state tracks only
    * users inside a window plus one marker row per seen user within
    * retention. */
  def funnelStream(events: Dataset[EventIn], steps: Seq[String], horizonHours: Int,
      watermark: String = "10 minutes",
      retentionHours: Int = 24 * 365): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    val horizonMs = horizonHours * 3600000L
    val retentionMs = retentionHours * 3600000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.step >= 0) {
              // live chain's window expired → permanent failed marker
              state.update(FunnelState(-2, s.stepTs, s.startTs))
              state.setTimeoutTimestamp(s.stepTs + retentionMs)
            } else state.remove() // marker retention elapsed
            Iterator.empty
          } else {
            var cur = state.getOption
            var out = List.empty[FunnelOut]
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              val idx = steps.indexOf(e.event_type)
              cur match {
                case None if idx == 0 =>
                  if (steps.size == 1) {
                    out ::= FunnelOut(userId, e.ts, 0L)
                    cur = Some(FunnelState(-1, t, t))
                  } else cur = Some(FunnelState(1, t, t))
                case Some(s) if s.step >= 0 && idx == s.step &&
                    t >= s.stepTs && t < s.stepTs + horizonMs =>
                  if (s.step == steps.size - 1) {
                    out ::= FunnelOut(userId, e.ts, t - s.startTs)
                    cur = Some(FunnelState(-1, t, s.startTs)) // completion marker
                  } else cur = Some(FunnelState(s.step + 1, t, s.startTs))
                case Some(s) if s.step >= 0 && idx == s.step &&
                    t >= s.stepTs + horizonMs =>
                  // the awaited step arrived but outside the window: the
                  // chain can never complete — fail it NOW (don't wait for
                  // the watermark) so semantics don't depend on timing
                  cur = Some(FunnelState(-2, s.stepTs, s.startTs))
                case _ => () // non-step event, wrong step, marker, or early dup
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                if (s.step >= 0) s.stepTs + horizonMs else s.stepTs + retentionMs)
            }
            out.reverseIterator
          }
      }
  }

  /** Streaming exact dedup: first occurrence of each (user_id, event_id)
    * wins; duplicates arriving within the watermark horizon are dropped.
    * Spark's built-in `dropDuplicates` + watermark — state expires with
    * the watermark instead of growing forever. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_id")

  /** Streaming dedup with TIME-BOUNDED keys ([[dedupStream]]'s sibling for
    * the replay/retry regime): `dropDuplicatesWithinWatermark` deduplicates
    * keys whose copies arrive within the watermark delay OF EACH OTHER,
    * rather than keying state by exact event time — the right contract
    * when a producer retries the same record with a fresh-ish timestamp.
    * State for a key is dropped once the watermark passes its first
    * sighting + delay, so the store is bounded by the key arrival rate ×
    * watermark horizon regardless of stream length. */
  def dedupStreamWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_id")

  final case class IncreaseOut(user_id: Long, ts: Timestamp, increase_cents: Long)

  /** Per-user last-sample state: (event-time ms, event id, cents). Public
    * for the state encoder. */
  final case class CounterState(lastTs: Long, lastId: Long, lastCents: Long)

  /** Streaming counter-reset-aware increase — the real-time twin of
    * [[graft.analytics.TimeSeries.counterIncrease]]: each sample emits its
    * delta against the user's previous sample, a drop counting as a reset
    * that restarts from zero (the Prometheus correction), the user's first
    * sample counting in full. State is ONE (ts, id, cents) triple per
    * user; users idle past `idleHours` of event time have it dropped, so
    * the store tracks active keys, not stream history. Out-of-order
    * samples at or before the stored (ts, id) are skipped — with the
    * watermark honored by the producer they are duplicates, and skipping
    * keeps emission deterministic across micro-batch boundaries (a
    * summed-by-hour downstream equals the batch operator's increase). */
  def counterIncreaseStream(events: Dataset[EventIn],
      watermark: String = "10 minutes", idleHours: Int = 24): Dataset[IncreaseOut] = {
    import events.sparkSession.implicits._
    val idleMs = idleHours * 3600000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CounterState, IncreaseOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[CounterState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption
            var out = List.empty[IncreaseOut]
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              // HALF_UP away from zero — Catalyst round() semantics, so the
              // streamed cents equal the batch operator's bit for bit
              // (math.round rounds -0.5 UP to 0, Spark rounds it to -1)
              val cents = java.math.BigDecimal.valueOf(e.value * 100)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue
              cur match {
                case Some(s) if t < s.lastTs || (t == s.lastTs && e.event_id <= s.lastId) =>
                  () // late duplicate/out-of-order: skip
                case Some(s) =>
                  val inc = if (cents >= s.lastCents) cents - s.lastCents else cents
                  out ::= IncreaseOut(userId, e.ts, inc)
                  cur = Some(CounterState(t, e.event_id, cents))
                case None =>
                  out ::= IncreaseOut(userId, e.ts, cents)
                  cur = Some(CounterState(t, e.event_id, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + idleMs)
            }
            out.reverseIterator
          }
      }
  }

  /** Stream-stream interval join: each purchase matched to the same user's
    * signups within the preceding `horizon`. Watermarks on both sides
    * bound the join state — purchase state can expire once no matching
    * signup can still arrive and vice versa, which is what keeps a
    * stream-stream join runnable forever at scale. */
  def purchasesAfterSignup(purchases: DataFrame, signups: DataFrame,
      watermark: String = "1 hour", horizon: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions._
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event"), col("value").as("p_value"))
    val s = signups.withWatermark("ts", watermark)
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    p.join(s,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
  }

  /** Wire row of the streaming document feed. */
  final case class DocIn(doc_id: Long, text: String)

  /** One LSH banding row ([[graft.ops.Dedup.minHashBanded]]'s schema). */
  final case class BandIn(doc_id: Long, band: Int, bh: Long)

  /** Emitted candidate pair, canonical orientation (id_a < id_b). */
  final case class CandOut(id_a: Long, id_b: Long)

  /** Per-bucket membership (public for the state encoder). */
  final case class BucketState(ids: List[Long])

  /** STREAMING MinHash-LSH candidate generation — incremental near-dup
    * detection as documents arrive: each (band, bandhash) bucket keeps
    * the doc ids seen so far, and a new arrival emits one candidate pair
    * per stored member (the pair materializes exactly when its second
    * member arrives, so the union of emissions over any micro-batch
    * partitioning equals the batch band-join's candidate set —
    * LSH collision is arrival-order-independent, which is what
    * [[ParityCheck.minhashParity]] verifies). Downstream, candidates
    * flow through the same exact-jaccard verification as batch
    * ([[graft.ops.Dedup.jaccardVerify]]).
    *
    * State: one id list per OCCUPIED bucket — proportional to corpus
    * documents × bands, the irreducible memory of dedup-against-all-
    * history (same asymptotics as the batch band frame; Spark's state
    * store spills via RocksDB at scale). Pipelines that only need
    * dedup against a bounded horizon put a watermark timeout here;
    * dedup against deep history belongs to the bloom-gated batch tier
    * ([[graft.ops.Dedup.historyDedupBloom]]), with this operator
    * handling the live stream in front of it. */
  def lshCandidatesStream(banded: Dataset[BandIn]): Dataset[CandOut] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(b => (b.band, b.bh))
      .flatMapGroupsWithState[BucketState, CandOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandIn], state: GroupState[BucketState]) =>
          val (next, out) = bucketStep(
            state.getOption.map(_.ids).getOrElse(Nil),
            rows.map(_.doc_id).toSeq)
          state.update(BucketState(next))
          out.iterator
      }
  }

  /** One LSH banding row with the document's EVENT TIME — the input of
    * the bounded-horizon variant. */
  final case class BandTsIn(doc_id: Long, ts: Timestamp, band: Int, bh: Long)

  /** Per-bucket timed membership: (doc_id, event-time ms) pairs.
    * Public for the state encoder. */
  final case class TimedBucketState(ids: List[(Long, Long)])

  /** BOUNDED-HORIZON streaming MinHash-LSH candidates —
    * [[lshCandidatesStream]] for pipelines that only need dedup against
    * a sliding horizon of recent documents rather than all history: a
    * new arrival pairs only with bucket members whose event time is
    * within `horizonMs` of its own, members older than that are evicted
    * as arrivals pass them, and a bucket idle past the horizon has its
    * WHOLE state dropped by an event-time timeout once the watermark
    * passes — so the state store holds (arrival rate × (horizon +
    * watermark)) rows instead of the full corpus, the RESOURCE bound
    * that makes live dedup runnable forever.
    *
    * Semantics, for ANY delivery order the watermark admits (not just
    * chronological): pair (a, b) is emitted exactly when
    * |t_b − t_a| ≤ horizon. Two mechanics make that hold under late
    * data: members are RETAINED an extra `watermarkMs` beyond the
    * horizon (an arrival at t evicts only below t − horizon −
    * watermark), so a maximally-late admissible arrival still finds
    * every partner; and emissions are filtered to the horizon in BOTH
    * directions, so a late arrival never pairs with a member newer
    * than itself by more than the horizon. The invariant is
    * micro-batch-boundary-independent ([[ParityCheck.minhashTtlParity]]
    * gates it against the time-windowed batch twin) and
    * delivery-order-robust within the watermark (`LshBucketProps`).
    *
    * The operator sets the watermark on `ts` itself from `watermarkMs`
    * (EventTimeTimeout requires one) — one value drives both the
    * admission bound and the retention slack, so they cannot drift. */
  def lshCandidatesStreamTtl(banded: Dataset[BandTsIn], horizonMs: Long,
      watermarkMs: Long = 600000L): Dataset[CandOut] = {
    import banded.sparkSession.implicits._
    banded
      .withWatermark("ts", s"$watermarkMs milliseconds")
      .groupByKey(b => (b.band, b.bh))
      .flatMapGroupsWithState[TimedBucketState, CandOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandTsIn], state: GroupState[TimedBucketState]) =>
          if (state.hasTimedOut) {
            // watermark passed newest member + horizon: every arrival
            // still admissible is > newest + horizon — nothing to come
            // can pair with anything held, drop the whole bucket
            state.remove()
            Iterator.empty
          } else {
            val (next, out) = timedBucketStep(
              state.getOption.map(_.ids).getOrElse(Nil),
              rows.map(b => (b.doc_id, b.ts.getTime)).toSeq,
              horizonMs, latenessMs = watermarkMs)
            if (next.isEmpty) state.remove()
            else {
              state.update(TimedBucketState(next))
              val newest = next.iterator.map(_._2).max
              state.setTimeoutTimestamp(newest + horizonMs)
            }
            out.iterator
          }
      }
  }

  /** The pure timed transition [[lshCandidatesStreamTtl]] folds over
    * micro-batches — separated (like [[bucketStep]]) so the parity
    * invariant is property-testable without a streaming harness: over
    * ANY partitioning of an arrival sequence whose out-of-orderness is
    * bounded by `latenessMs` (each arrival's ts ≥ the running max ts −
    * lateness — exactly what a watermark of that delay admits), the
    * emissions union to exactly { (a, b) sharing the bucket with
    * |t_b − t_a| ≤ horizon }, duplicate-free. Arrivals process in
    * (ts, id) order within the batch; each arrival evicts members below
    * t − horizon − lateness (the lateness slack keeps partners alive
    * for arrivals still admissible behind it), then pairs with every
    * survivor within the horizon — the two-sided emission bound is what
    * stops a late arrival pairing with members NEWER than itself by
    * more than the horizon. Why no admissible pair is ever lost: if
    * |t_x − t_y| ≤ horizon and some z processed between them evicted x
    * before y arrived, then t_z > t_x + horizon + lateness, and y's
    * admissibility (t_y ≥ t_z − lateness) would force
    * t_y − t_x > horizon — a contradiction. Re-arrivals of an id
    * already held are dropped (re-banded duplicates emit nothing
    * new). */
  private[graft] def timedBucketStep(seen: List[(Long, Long)],
      arrivals: Seq[(Long, Long)], horizonMs: Long,
      latenessMs: Long = 0L): (List[(Long, Long)], List[CandOut]) = {
    var acc = seen
    val out = List.newBuilder[CandOut]
    val seenIds = scala.collection.mutable.Set[Long](seen.map(_._1): _*)
    for ((d, t) <- arrivals.distinct.sortBy { case (id, ts) => (ts, id) }
         if !seenIds.contains(d)) {
      acc = acc.filter { case (_, ts) => ts >= t - horizonMs - latenessMs }
      for ((s, ts) <- acc if math.abs(ts - t) <= horizonMs)
        out += CandOut(math.min(s, d), math.max(s, d))
      acc = (d, t) :: acc
      seenIds += d
    }
    (acc, out.result())
  }

  /** The pure bucket transition [[lshCandidatesStream]] folds over
    * micro-batches: given the ids already in a bucket and a batch of
    * arrivals, emit one canonical pair per (stored, fresh) and
    * (fresh, earlier-fresh) combination and return the grown membership.
    * Separated so the parity invariant — emissions over ANY partitioning
    * of an arrival sequence union to exactly the all-distinct-pairs set,
    * duplicate-free — is property-testable without a streaming harness
    * (`LshBucketProps`). */
  private[graft] def bucketStep(seen: List[Long],
      arrivals: Seq[Long]): (List[Long], List[CandOut]) = {
    val seenSet = seen.toSet
    // deterministic within-batch order; drop ids already in state
    // (re-banded duplicates of the same doc emit nothing new)
    val fresh = arrivals.distinct.sorted.filterNot(seenSet)
    var acc = seen
    val out = List.newBuilder[CandOut]
    for (d <- fresh) {
      for (s <- acc)
        out += CandOut(math.min(s, d), math.max(s, d))
      acc = d :: acc
    }
    (acc, out.result())
  }
}
