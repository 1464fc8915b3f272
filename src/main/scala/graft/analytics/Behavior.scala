package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral/product analytics over the event stream — the funnel and
  * retention reports an observability stack computes next to its log
  * queries (SURVEY §2.8 extension surface). Both are exact, integer-only
  * aggregations (ratios are exact integer quotients in doubles), so they
  * hash-match the DuckDB oracle bit-for-bit.
  */
object Behavior {

  /** Sequential first-occurrence funnel: step k is completed by a user at
    * the EARLIEST event of `steps(k)` at-or-after their step-(k−1)
    * completion and strictly inside the `horizonHours` window from it.
    * Emits one row per step with the surviving user count.
    *
    * Dataflow: one keyed frame per step — filter to the step's type, join
    * on user to the previous step frame (both sides already reduced to one
    * row per user), min-ts aggregate. Every join and aggregate is keyed on
    * user_id; the step frames shrink monotonically, and the final counts
    * are one-row aggregates unioned into an S-row result. At 100 TB each
    * step costs one shuffle of (user, ts) pairs — never raw events beyond
    * the per-type filter of the scan. */
  def funnelCounts(events: DataFrame, steps: Seq[String], horizonHours: Int): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val perStep = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val typed = events.filter(col("event_type") === step)
          .select(col("user_id"), col("ts"))
        val advanced = prev match {
          case None => typed
          case Some(p) =>
            typed.join(p.select(col("user_id").as("_pu"), col("_t").as("_pt")),
              col("user_id") === col("_pu") &&
                col("ts") >= col("_pt") &&
                col("ts") < col("_pt") + expr(s"INTERVAL $horizonHours HOURS"))
        }
        Some(advanced.groupBy(col("user_id")).agg(min(col("ts")).as("_t")))
    }.flatten
    perStep.zip(steps).zipWithIndex.map { case ((frame, name), i) =>
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step_idx"), lit(name).as("step"), col("n_users"))
    }.reduce(_ unionByName _).orderBy(col("step_idx"))
  }

  /** ClickHouse `sequenceMatch('(?1).*(?2)…')` analogue: per user, does the
    * event stream contain `steps(0)`, then `steps(1)` strictly later, …, in
    * order (arbitrary other events between)? Returns one row per MATCHING
    * user with the greedy earliest-completion chain `(user_id, t1..tN)` —
    * the canonical witness: t1 = min ts of step 1, t_k = min ts of step k
    * strictly after t_{k-1}. Greedy earliest matching is exact for
    * subsequence existence (any witness can be left-shifted onto the greedy
    * one), so emptiness/membership agrees with the regex semantics.
    *
    * Scale shape: one keyed min-aggregation per step over the step-filtered
    * stream, joined user-keyed to the (one-row-per-user) previous chain —
    * the same monotone-shrinking dataflow as [[funnelCounts]]; no sorted
    * per-user state, no window over raw events. Reference analogue:
    * ClickHouse sequenceMatch (SQL-reference/aggregate-functions/
    * parametric-functions) evaluated per shard over a sorted stream. */
  def sequenceMatches(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "sequence pattern needs at least two steps")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (prev, (step, i)) =>
      val k = i + 2
      val typed = events.filter(col("event_type") === step)
        .select(col("user_id").as("_u"), col("ts").as("_ts"))
      val carried = col("user_id") +: (1 until k).map(j => col(s"t$j"))
      prev.join(typed, col("user_id") === col("_u") && col("_ts") > col(s"t${k - 1}"))
        .groupBy(carried: _*)
        .agg(min(col("_ts")).as(s"t$k"))
    }.orderBy(col("user_id"))
  }

  /** ClickHouse `sequenceNextNode` analogue: for every user who completed
    * the `steps` chain (strictly-increasing timestamps, earliest
    * completion — [[sequenceMatches]] semantics), the event that comes
    * NEXT after the chain completes — the "what do users do after
    * converting" question. Users whose chain completes on their last
    * event are kept with a NULL next (ClickHouse returns NULL there too).
    *
    * Scale shape: the chain frame is one row per qualifying user; the
    * next-event lookup is a user-keyed join filtered to `ts > t_end`
    * reduced by a min-struct aggregate (map-side partial) — no per-user
    * sort, no window over raw events. Ties at the same timestamp resolve
    * by event_id, mirrored in the oracle. */
  def sequenceNextNode(events: DataFrame, steps: Seq[String]): DataFrame = {
    val kEnd = s"t${steps.size}"
    val chains = sequenceMatches(events, steps)
      .select(col("user_id"), col(kEnd).as("t_end"))
    val nxt = events
      .join(chains.withColumnRenamed("user_id", "_u"),
        col("user_id") === col("_u") && col("ts") > col("t_end"))
      .groupBy(col("user_id"), col("t_end"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("nx"))
      .select(col("user_id").as("_nu"), col("t_end").as("_nt"),
        col("nx.event_type").as("next_type"), col("nx.ts").as("next_ts"))
    chains
      .join(nxt, col("user_id") === col("_nu") && col("t_end") === col("_nt"),
        "left_outer")
      .select(col("user_id"), col("t_end"), col("next_type"), col("next_ts"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse-`sequenceCount`-style disjoint-match counting: per user,
    * the MAXIMUM number of non-overlapping "`a` then later `b`" pairs
    * (each event consumed by at most one pair). Note this is the
    * attribution-friendly quantity — ClickHouse's own `sequenceCount`
    * restarts its scan after each match end and therefore undercounts
    * interleaved journeys (stream `a a b b`: max disjoint pairs = 2,
    * restart-scan = 1).
    *
    * Computed in closed form rather than by iterating matches: by flow
    * duality the maximum is
    * `min over prefixes t of (#a in prefix t + #b after t)` — every pair
    * has its `a` inside any prefix or its `b` after it, and the
    * pending-counter greedy attains the bound. So one cumulative-count
    * window per user (partitioned by user — scales across users, no
    * iteration, no per-match dataflow rounds) plus a min-aggregate yields
    * the exact count. Only users with at least one match are emitted.
    *
    * Tie handling: events are ordered by (ts, event_id), so a simultaneous
    * a/b resolves deterministically by id — the oracle uses the identical
    * window order. */
  def sequenceCounts(events: DataFrame, a: String, b: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filtered = events
      .filter(col("event_type") === a || col("event_type") === b)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === a, 1L).otherwise(0L).as("_is_a"),
        when(col("event_type") === b, 1L).otherwise(0L).as("_is_b"))
    filtered
      .withColumn("_cum_a", sum(col("_is_a")).over(w))
      .withColumn("_cum_b", sum(col("_is_b")).over(w))
      .groupBy(col("user_id"))
      .agg(
        sum(col("_is_b")).as("_tot_b"),
        min(col("_cum_a") - col("_cum_b")).as("_md"))
      // min over t>0 of A(t)+Btot-B(t) = Btot + min(A(t)-B(t)); the t=0
      // prefix contributes Btot itself, i.e. min(..., 0)
      .select(col("user_id"),
        (col("_tot_b") + least(col("_md"), lit(0L))).as("n_matches"))
      .filter(col("n_matches") > 0L)
      .orderBy(col("user_id"))
  }

  /** ClickHouse `windowFunnel(window)(ts, c1, c2, …)` analogue: the max
    * funnel level each user reaches with the WHOLE chain inside a single
    * `windowHours` window anchored at its first step (contrast
    * [[funnelCounts]], where each step gets its own horizon from the
    * previous step).
    *
    * Exact closed form via CHAINED conditional running maxima — no
    * per-user sort-and-scan state: let `m1(t)` = latest step-1 time ≤ t
    * (a running max over the user's ordered events), and `m_k(t)` =
    * latest achievable chain-start over step-k events ≤ t
    * (`max(when(step_k, m_{k-1}))` running). A user reaches level k iff
    * some step-k event has `t − m_{k-1}(t) ≤ window`: maximizing the
    * start time is optimal for the window test, intermediate events are
    * automatically inside `[t1, t_k]`, and level-k feasibility implies
    * level-(k−1) (the same chain truncated), so the emitted counts are
    * monotone. Every step is a window over one user-keyed exchange; the
    * identical window trees run in DuckDB, so the result hash-matches.
    * Emits one row per level: (level_idx, step, n_users). */
  def windowFunnelLevels(events: DataFrame, steps: Seq[String],
      windowHours: Int): DataFrame = {
    require(steps.size >= 2, "windowFunnel needs at least two steps")
    val windowMs = windowHours * 3600000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("_t"))
    // _m1.._m{n-1}: best chain-start time reaching each prefix, per row
    val chained = steps.dropRight(1).zipWithIndex.foldLeft(base) {
      case (df, (step, i)) =>
        val src = if (i == 0) when(col("event_type") === step, col("_t"))
                  else when(col("event_type") === step, col(s"_m$i"))
        df.withColumn(s"_m${i + 1}", max(src).over(w))
    }
    val perUser = chained.groupBy(col("user_id")).agg(
      max(col("_m1").isNotNull).as("_l1"),
      (steps.tail.zipWithIndex.map { case (step, i) =>
        max(col("event_type") === step &&
          (col("_t") - col(s"_m${i + 1}")) <= windowMs).as(s"_l${i + 2}")
      }): _*)
    steps.zipWithIndex.map { case (step, i) =>
      perUser.filter(col(s"_l${i + 1}") === true)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("level_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_ unionByName _).orderBy(col("level_idx"))
  }

  /** ClickHouse-EXACT `sequenceCount('(?1).*(?2)')`: restart-scan
    * semantics (each match's search resumes after the previous match's
    * end). Closed form: in the a/b-filtered per-user sequence the scan
    * completes a match exactly at every `b` whose immediately preceding
    * filtered event is an `a` — runs of equal types collapse (extra a's
    * before a match don't add matches, extra b's after one aren't
    * reachable), the compressed sequence alternates, and each a-run →
    * b-run boundary consumes exactly one match with the scan pointer
    * landing before the next a-run. So the count is ONE lag window over
    * the filtered stream plus a keyed count — per-user partitioned,
    * nothing global. Complements [[sequenceCounts]] (maximum disjoint
    * pairs): on `a a b b` this counts 1 where max-matching counts 2. */
  def sequenceCountsRestartScan(events: DataFrame, a: String, b: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .filter(col("event_type") === a || col("event_type") === b)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("_prev", lag(col("event_type"), 1).over(w))
      .filter(col("event_type") === b && col("_prev") === a)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse `retention(cond1, …, condN)` analogue: per-user boolean
    * flags for each condition, then the cohort sums `Σ r1, Σ (r1 ∧ r2),
    * …, Σ (r1 ∧ rN)` — every later condition only counts for users who
    * satisfied the FIRST (the cohort anchor). Conditions here are
    * (event_type, day-offset from the stream's first day) pairs. One
    * user-keyed aggregation of bool_or flags plus one global sum — group
    * rows only past the first reduction. */
  def retentionCohort(events: DataFrame,
      conds: Seq[(String, Int)]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val day0 = events.agg(date_trunc("day", min(col("ts"))).as("_d0"))
    val withDay = events.crossJoin(broadcast(day0))
      .withColumn("_day_idx",
        datediff(date_trunc("day", col("ts")), col("_d0")).cast("int"))
    val flagCols = conds.zipWithIndex.map { case ((et, d), i) =>
      max(col("event_type") === et && col("_day_idx") === d).as(s"_r${i + 1}")
    }
    val flags = withDay.groupBy(col("user_id"))
      .agg(flagCols.head, flagCols.tail: _*)
    val sumCols = conds.indices.map { i =>
      val cond = if (i == 0) col("_r1") else col("_r1") && col(s"_r${i + 1}")
      sum(when(cond, 1L).otherwise(0L)).as(s"n_cond${i + 1}")
    }
    flags.agg(sumCols.head, sumCols.tail: _*)
  }

  /** Day-over-day retention: for each active day, how many of its users
    * are active again the next day. One distinct (user, day) reduction,
    * one self-join keyed on user, one per-day count — rate is the exact
    * integer quotient. */
  def dailyRetention(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("dy"))
      .distinct()
    days.as("a")
      .join(days.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.dy") === col("a.dy") + expr("INTERVAL 1 DAY"),
        "left_outer")
      .groupBy(col("a.dy").as("dy"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(when(col("b.user_id").isNotNull, 1L).otherwise(0L)).as("n_retained"))
      .withColumn("retention_rate",
        col("n_retained").cast("double") / col("n_active").cast("double"))
      .orderBy(col("dy"))
  }

  /** Top user journeys: each user's first `steps` event types in
    * (ts, event_id) order joined with '>', counted across users, top `k`
    * paths — the path-analysis panel behind "how do users actually reach
    * purchase?". The per-user path is extracted with a rank-filtered
    * window (WindowGroupLimit pre-trims shuffle partitions to their local
    * first-k) and conditional aggregation — no collect_list buffers, so an
    * abusive user with millions of events still costs k rows past the
    * window. Users with fewer than `steps` events keep their shorter path
    * (nulls drop out of concat_ws). Top-k plans as TakeOrderedAndProject;
    * ties break lexicographically. */
  /** Cohort retention triangle: users grouped by their first-activity day
    * (the cohort), distinct actives per (cohort, age-in-days) — the
    * classic product-analytics heatmap. One distinct (user, day)
    * reduction, a user-keyed join to each user's min day, a keyed
    * count-distinct, and a cohort-partitioned window over GROUP rows for
    * the age-0 denominator. Rates are exact integer quotients. */
  def cohortTriangle(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("dy")).distinct()
    val first = days.groupBy(col("user_id")).agg(min(col("dy")).as("cohort"))
    val counts = days.join(first, "user_id")
      .groupBy(col("cohort"), datediff(col("dy"), col("cohort")).as("age_days"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val w = Window.partitionBy(col("cohort"))
    counts
      .withColumn("cohort_size",
        max(when(col("age_days") === 0, col("n_active"))).over(w))
      .withColumn("retention_rate",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
      .orderBy(col("cohort"), col("age_days"))
  }

  def topJourneys(events: DataFrame, steps: Int = 3, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val firstK = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= steps)
    val stepCols = (1 to steps).map(i =>
      max(when(col("rn") === i, col("event_type"))).as(s"_s$i"))
    firstK
      .groupBy(col("user_id"))
      .agg(stepCols.head, stepCols.tail: _*)
      .select(concat_ws(">", (1 to steps).map(i => col(s"_s$i")): _*).as("journey"))
      .groupBy(col("journey"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("journey"))
      .limit(k)
  }
}
