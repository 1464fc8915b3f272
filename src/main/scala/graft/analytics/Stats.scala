package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical-test aggregates over `events` — the ClickHouse
  * `welchTTest`/`cramersV`/`simpleLinearRegression`/`entropy` family,
  * re-derived for cross-engine exactness.
  *
  * Design rule (the repo-wide one): every data-sized aggregation produces
  * INTEGER sums (cents, counts, squared cents), which are order-free and
  * overflow-checked against the fixture scales; the statistics are then
  * fixed-shape IEEE double arithmetic (+,*,/,sqrt are correctly rounded,
  * so DuckDB reproduces them bit-for-bit). No ln/exp anywhere — where a
  * classical definition needs a transcendental (entropy), the operator
  * substitutes a rational-arithmetic diversity index with the same
  * decision content (Simpson index; Simpson, "Measurement of diversity",
  * Nature 1949).
  *
  * Scale shape: each operator is ONE map-side-combinable keyed
  * aggregation over the events; everything after runs on one row per
  * group (a handful), joined pairwise where the statistic compares
  * groups. Nothing data-sized crosses a second shuffle.
  */
object Stats {

  private def cents = round(col("value") * 100).cast("long")

  /** Per-group exact moments: n, Σc, Σc² as BIGINT (c = value cents).
    * Σc² fits comfortably: max cents ≈ 5·10⁶ squares to 2.5·10¹³; even
    * 10⁹ rows per group stays < 2.5·10²² only in a 128-bit engine — at
    * Spark's BIGINT ceiling this bounds each group to ~3.6·10⁵ rows per
    * max-value regime; real telemetry values (latencies, prices) are far
    * smaller. The DOUBLE-side math after this frame is group-count-sized.
    */
  private def moments(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents).as("sc"),
        sum(cents * cents).as("sc2"))

  /** Welch's unequal-variance t statistic for every event-type pair
    * (Welch, Biometrika 1947), with the Welch–Satterthwaite degrees of
    * freedom. Output per (type_a < type_b): n/mean/var per side, t, df.
    * The p-value needs the incomplete beta function (transcendental,
    * engine-varying) and is deliberately left to the caller's stats
    * library — t and df carry the full decision content. */
  def welchTTest(events: DataFrame): DataFrame = {
    val m = moments(events)
    def side(sfx: String) = m.select(
      col("event_type").as(s"type_$sfx"),
      col("n").as(s"n_$sfx"),
      (col("sc").cast("double") / col("n")).as(s"mean_$sfx"),
      ((col("sc2").cast("double") -
        col("sc").cast("double") * col("sc").cast("double") / col("n")) /
        (col("n") - lit(1)).cast("double")).as(s"var_$sfx"))
    val a = side("a")
    val b = side("b")
    val va = col("var_a") / col("n_a").cast("double")
    val vb = col("var_b") / col("n_b").cast("double")
    a.join(b, col("type_a") < col("type_b"))
      .withColumn("t", (col("mean_a") - col("mean_b")) / sqrt(va + vb))
      .withColumn("df",
        ((va + vb) * (va + vb)) /
          (va * va / (col("n_a") - lit(1)).cast("double") +
            vb * vb / (col("n_b") - lit(1)).cast("double")))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Cramér's V association between event_type and day-of-week (Cramér,
    * Mathematical Methods of Statistics 1946, §21.9): χ² over the r×c
    * contingency table of integer counts, V = √(χ²/(N·min(r−1,c−1))).
    * One row: (n, r, c, chi2, v). */
  def cramersV(events: DataFrame): DataFrame = {
    val observed = events
      .groupBy(col("event_type").as("rt"), dayofweek(col("ts")).as("ct"))
      .agg(count(lit(1)).as("o"))
    // χ² ranges over the FULL r×c grid — an expected-but-unobserved cell
    // contributes (0−e)²/e, and dropping it deflates strong associations
    // (a fully-determined 2×2 would score 1/√2 instead of 1)
    val cells = observed.select(col("rt")).distinct()
      .crossJoin(observed.select(col("ct")).distinct())
      .join(observed, Seq("rt", "ct"), "left_outer")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val rowTot = cells.groupBy(col("rt")).agg(sum(col("o")).as("rn"))
    val colTot = cells.groupBy(col("ct")).agg(sum(col("o")).as("cn"))
    val tot = cells.agg(sum(col("o")).as("nn"),
      countDistinct(col("rt")).as("r"), countDistinct(col("ct")).as("c"))
    val e = col("rn").cast("double") * col("cn").cast("double") / col("nn")
    // χ² is a sum of DOUBLES — a plain distributed sum would depend on
    // partition order in the last ulps. The cells are collected into a
    // (rt, ct)-sorted array and folded LEFT-TO-RIGHT, which fixes the
    // association; the oracle folds the identically-ordered list. The
    // collect is safe at any data scale: the table is r×c cells, not rows.
    cells
      .join(broadcast(rowTot), "rt").join(broadcast(colTot), "ct")
      .crossJoin(broadcast(tot))
      .select(col("nn"), col("r"), col("c"),
        struct(col("rt"), col("ct"),
          ((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
            .as("cell")).as("kc"))
      .groupBy(col("nn"), col("r"), col("c"))
      .agg(sort_array(collect_list(col("kc"))).as("cells"))
      .select(col("nn").as("n"), col("r"), col("c"),
        aggregate(col("cells"), lit(0.0),
          (acc, x) => acc + x.getField("cell")).as("chi2"))
      .withColumn("v",
        sqrt(col("chi2") / (col("n").cast("double") *
          least(col("r") - 1, col("c") - 1).cast("double"))))
  }

  /** Per-event-type least-squares regression of value cents on hours
    * since 2024-01-01 (ClickHouse `simpleLinearRegression`). x is
    * REFERENCED to the corpus epoch so the exact BIGINT sums (Σx, Σx²,
    * Σxy) stay small and the double-side normal equations don't
    * catastrophically cancel. Output: (event_type, n, slope, intercept),
    * slope in cents/hour. */
  def groupLinReg(events: DataFrame): DataFrame = {
    // FLOOR division (pmod is non-negative), matching DuckDB `//` for any
    // sign — Spark `div` truncates toward zero, which would put a pre-2024
    // event one bin off the oracle. unix_timestamp(ts) on a TIMESTAMP
    // column reads the stored UTC instant (no session-tz parse involved).
    val x = expr("(unix_timestamp(ts) - 1704067200L" +
      " - pmod(unix_timestamp(ts) - 1704067200L, 3600L)) div 3600L")
    val agg = events
      .select(col("event_type"), x.as("x"), cents.as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    val nD = col("n").cast("double")
    val den = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val slope = (nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) / den
    agg.select(col("event_type"), col("n"),
        slope.as("slope"),
        ((col("sy").cast("double") - slope * col("sx").cast("double")) / nD)
          .as("intercept"))
      .orderBy(col("event_type"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `value`
    * distributions of two event types (Kolmogorov 1933; Smirnov 1939),
    * in exact parts-per-billion: `D = max_v |F_a(v) − F_b(v)|` where each
    * ECDF is evaluated as `c·1e9 div n` (BIGINT floor division on exact
    * cumulative counts — order-free, engine-exact, within 2·10⁻⁹ of the
    * real-valued D; exact for n ≤ 9.2·10⁹ per sample at the BIGINT
    * ceiling). One row: (n_a, n_b, d_ppb).
    *
    * Scale shape: one keyed aggregation folds the events to the DISTINCT
    * value domain (per value: a-count, b-count); BOTH cumulative counts
    * then ride one DOMAIN-ADAPTIVE prefix-sum pass
    * ([[GlobalRank.withRunningTotalsLongAdaptive]]): a small measured
    * domain cumulates on one declared task (the stitch machinery is pure
    * overhead there), while a 10⁸⁺ domain (a continuous metric at
    * 100 TB) takes the range-partitioned construction — where a bare
    * `Window.orderBy(value)` would sort the whole domain on ONE task.
    * The totals attach as a broadcast 1-row aggregate; the max is a
    * 1-row fold. */
  def ksTest(events: DataFrame, typeA: String, typeB: String): DataFrame = {
    val perValue = twoSampleCounts(events, typeA, typeB)
    val totals = perValue.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    GlobalRank.withRunningTotalsLongAdaptive(perValue, Nil, Seq(col("value")),
        Seq(col("ca") -> "cca", col("cb") -> "ccb"))
      .select(col("cca"), col("ccb"))
      .crossJoin(broadcast(totals))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(abs(expr("cca * 1000000000L div n_a") -
        expr("ccb * 1000000000L div n_b"))).as("d_ppb"))
      .select(col("n_a"), col("n_b"), col("d_ppb"))
  }

  /** Mann–Whitney U (Mann & Whitney 1947) for the same two samples, with
    * the standard midrank treatment of ties kept INTEGER by working in
    * DOUBLED ranks: a distinct value preceded by `p` observations with
    * `t` ties has midrank `p + (t+1)/2`, i.e. doubled midrank
    * `2p + t + 1` — always integral. One row:
    * (n_a, n_b, r2_a = Σ doubled ranks of sample a,
    * u2_a = 2·U_a = r2_a − n_a·(n_a+1)). Same distinct-value fold and
    * domain-adaptive prefix-sum pass as [[ksTest]] (the preceding-count
    * `p` is the EXCLUSIVE prefix: inclusive running total minus the row's
    * own tie count); every quantity is an exact BIGINT. */
  def mannWhitneyU(events: DataFrame, typeA: String, typeB: String): DataFrame = {
    val perValue = twoSampleCounts(events, typeA, typeB)
      .withColumn("t", col("ca") + col("cb"))
    val totals = perValue.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    GlobalRank.withRunningTotalsLongAdaptive(perValue, Nil, Seq(col("value")),
        Seq(col("t") -> "_cumt"))
      .select(col("ca"), col("t"), (col("_cumt") - col("t")).as("p"))
      .crossJoin(broadcast(totals))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("ca") * (lit(2L) * col("p") + col("t") + lit(1L)))
        .as("r2_a"))
      .withColumn("u2_a", col("r2_a") - col("n_a") * (col("n_a") + lit(1L)))
      .select(col("n_a"), col("n_b"), col("r2_a"), col("u2_a"))
  }

  /** Hourly error-rate Wilson score interval (Wilson, JASA 1927) at 95%
    * (z = 1.96, z² = 3.8416 — decimal literals both engines parse to the
    * same doubles): per hour, trials n = all events, successes k =
    * `error` events, and the interval
    * `(p̂ + z²/2n ∓ z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)` — the bound a
    * burn-rate alert should use instead of the raw ratio when n is small.
    * The double tree is written ONCE and mirrored token-for-token in the
    * oracle: every op is IEEE +,−,*,/,√ (correctly rounded), so the
    * bounds hash-match. One keyed integer aggregation; the double math
    * runs on hour-count-sized rows. */
  def wilsonErrorBounds(events: DataFrame): DataFrame = {
    val agg = events
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val denom = lit(1.0) + lit(3.8416) / nD
    val center = p + lit(3.8416) / (lit(2.0) * nD)
    val half = lit(1.96) *
      sqrt((p * (lit(1.0) - p) + lit(3.8416) / (lit(4.0) * nD)) / nD)
    agg.select(col("hr"), col("n"), col("k"),
        ((center - half) / denom).as("wilson_lo"),
        ((center + half) / denom).as("wilson_hi"))
      .orderBy(col("hr"))
  }

  /** Benford first-digit profile of the value column (Benford, Proc. Am.
    * Phil. Soc. 1938; Newcomb 1881) — the classic bulk data-quality /
    * fabrication screen: leading-digit frequencies of positive cent
    * amounts against the Benford expectation `log10(1 + 1/d)`. The
    * expectations are PRE-COMPUTED ppb literals (no transcendental is
    * evaluated at query time — both engines parse the same nine integer
    * constants), observed frequencies are exact `n_d·1e9 div n`, and the
    * deviation is an integer difference, so the whole profile
    * hash-matches. All nine digits are emitted (zero-filled), one keyed
    * integer aggregation over the data. */
  def benfordProfile(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val counts = events
      .select(cents.as("c"))
      .filter(col("c") > 0L)
      .select(expr("CAST(substring(CAST(c AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_d"))
    val grid = spark.range(1, 10).select(col("id").cast("int").as("digit"))
    // floor(log10(1 + 1/d) * 1e9), d = 1..9 — constants, not computed
    val benford = expr("""CASE digit
      WHEN 1 THEN 301029995L WHEN 2 THEN 176091259L WHEN 3 THEN 124938736L
      WHEN 4 THEN 96910013L  WHEN 5 THEN 79181246L  WHEN 6 THEN 66946789L
      WHEN 7 THEN 57991946L  WHEN 8 THEN 51152522L  ELSE 45757490L END""")
    grid.join(counts, Seq("digit"), "left_outer")
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
      .crossJoin(broadcast(counts.agg(sum(col("n_d")).as("n"))))
      .withColumn("observed_ppb", expr("n_d * 1000000000L div n"))
      .withColumn("benford_ppb", benford)
      .withColumn("dev_ppb", abs(col("observed_ppb") - col("benford_ppb")))
      .select(col("digit"), col("n_d"), col("observed_ppb"),
        col("benford_ppb"), col("dev_ppb"))
      .orderBy(col("digit"))
  }

  /** Shared two-sample fold: the events of `typeA`/`typeB` reduced to the
    * distinct `value` domain with per-value counts of each sample. */
  private def twoSampleCounts(events: DataFrame, typeA: String,
      typeB: String): DataFrame =
    events
      .filter(col("event_type").isin(typeA, typeB) && col("value").isNotNull)
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("cb"))

  /** Per-user behavioral diversity over event types: Simpson index in
    * exact parts-per-billion — `1e9 − Σc_t²·1e9 div n²` with BIGINT floor
    * division, the rational-arithmetic stand-in for Shannon entropy (a
    * log-free monotone alternative; both rank "all one type" lowest and
    * uniform highest). Integer-only, so it hash-matches any engine. */
  def typeDiversity(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("_s2"))
      .withColumn("simpson_ppb",
        lit(1000000000L) - expr("_s2 * 1000000000L div (n_events * n_events)"))
      .drop("_s2")
      .orderBy(col("user_id"))
}
