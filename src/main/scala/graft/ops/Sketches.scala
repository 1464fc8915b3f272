package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a grouped aggregation — the mergeable
  * frequency-sketch tier (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 2005; ClickHouse ships the same idea as `topK`).
  *
  * The sketch IS a (depth × width) count table: row `i` buckets every key
  * by `xxhash64(key, i) mod width`. Built as a plain `groupBy(h, b)` it
  * inherits Spark's map-side partial aggregation — each task emits at
  * most d·w cells regardless of row count, so the shuffle carries sketch
  * cells, not data, and cells merge by addition on any tree shape
  * (ClickHouse's -State/-Merge contract).
  *
  * Guarantees with FIXED seeds are deterministic facts checkable
  * in-query: `est(k) = min_i cell[i][h_i(k)]` never undercounts, and the
  * classic overcount bound `est ≤ true + (e/w)·N` per hash row is
  * asserted for every reported key rather than trusted probabilistically.
  */
object Sketches {

  /** The d×w sketch table `(h, b, c)` for `keys` (one row per input
    * occurrence). */
  def countMinTable(keys: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")
    keys
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("h"),
          pmod(xxhash64(col(keyCol), lit(i)), lit(width.toLong)).as("b"))): _*)).as("hb"))
      .groupBy(col("hb.h").as("h"), col("hb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Heavy hitters over the documents' whitespace tokens: report every
    * token with exact count ≥ `phi`·N, alongside the CMS estimate's
    * verdict (`est ≥ exact` and `est ≤ exact + (2/width)·N` — the
    * two-sided sandwich the sketch's theory promises, checked against
    * this dataset's truth). The exact side doubles as the reported count
    * so the frame is fully hash-comparable; the sketch path exercises the
    * real serving shape (estimate by min over d cells via an equi-join on
    * (h, b)). */
  def heavyHitters(documents: DataFrame, phi: Double,
      depth: Int = 4, width: Int = 2048): DataFrame = {
    val tokens = documents
      .select(explode(split(trim(col("text")), "\\s+")).as("raw"))
      .select(lower(col("raw")).as("token"))
    val cms = countMinTable(tokens, "token", depth, width)
    val exact = tokens.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = exact.agg(sum(col("n")).as("_N"))
    val hot = exact.crossJoin(broadcast(total))
      .filter(col("n") >= lit(phi) * col("_N"))
    val probes = hot.select(col("token"), col("n"), col("_N"),
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("h"),
          pmod(xxhash64(col("token"), lit(i)), lit(width.toLong)).as("b"))): _*)).as("hb"))
      .select(col("token"), col("n"), col("_N"),
        col("hb.h").as("h"), col("hb.b").as("b"))
    probes
      .join(broadcast(cms), Seq("h", "b"))
      .groupBy(col("token"), col("n"), col("_N"))
      .agg(min(col("c")).as("_est"))
      .select(col("token"), col("n"),
        (col("_est") >= col("n") &&
          (col("_est") - col("n")).cast("double") <=
            lit(2.0 / width) * col("_N").cast("double")).as("cms_ok"))
      .orderBy(col("token"))
  }

  /** KMV (k-minimum-values) theta sketches with SET INTERSECTION — the
    * capability HyperLogLog lacks (HLL unions; it cannot intersect).
    * Beyer, Haas, Reinwald, Sismanis, Gemulla, "On synopses for
    * distinct-value estimation under multiset operations", SIGMOD 2007;
    * the same construction underlies the Apache DataSketches theta family.
    *
    * Per event type, the sketch is the `k` smallest DISTINCT values of
    * splitmix64(user_id) — an order-statistic sketch needs a hash uniform
    * across the whole 64-bit range, which FNV-1a of short decimal strings
    * is NOT (its high bits barely mix, skewing θ badly); splitmix64 fully
    * avalanches and this repo already replicates it exactly in DuckDB
    * HUGEINT SQL, so the whole estimate is oracle-checkable, not trusted. For each type pair:
    * θ = the k-th smallest of the two sketches' union; the intersection
    * estimate is |{v ∈ A_k ∩ B_k : v < θ}| / θ_frac, where θ_frac is the
    * fraction of hash space below θ. When the union holds fewer than k
    * values both sketches are exhaustive and the estimate IS the exact
    * count.
    *
    * Scale shape: the one data-sized operation is `distinct (type, h)` —
    * a keyed aggregation with map-side partial dedup; the per-type top-k
    * trims via WindowGroupLimit (partial per partition, final k per
    * type). Everything after operates on ≤ k rows per type — pair
    * expansion, union ranking, and estimation are O(types² · k), driver
    * never involved. The EXACT intersection column is computed alongside
    * as the in-frame verdict (at true 100 TB scale you would drop it;
    * it is the point of the fixture check).
    *
    * Output per pair (type_a < type_b): n_exact, n_union (capped at the
    * union-rank ceiling), est (double; deterministic IEEE arithmetic),
    * ok = est within ±50 % of exact (or the sketch was exhaustive).
    */
  def kmvIntersections(events: DataFrame, k: Int = 64): DataFrame = {
    require(k > 1, s"k must exceed 1: $k")
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.Splitmix64.splitmix64(col("user_id"))
    val uh = events.select(col("event_type").as("t"), h.as("h")).distinct()
    val perType = Window.partitionBy(col("t")).orderBy(col("h"))
    val sk = uh.withColumn("rnk", row_number().over(perType))
      .filter(col("rnk") <= k)
      .select(col("t"), col("h"))

    val types = uh.select(col("t")).distinct()
    val pairs = types.select(col("t").as("ta"))
      .join(types.select(col("t").as("tb")), col("ta") < col("tb"))

    val tagged = pairs.join(sk, col("t") === col("ta"))
      .select(col("ta"), col("tb"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(pairs.join(sk, col("t") === col("tb"))
        .select(col("ta"), col("tb"), col("h"), lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("ta"), col("tb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val perPair = Window.partitionBy(col("ta"), col("tb")).orderBy(col("h"))
    val ranked = tagged.withColumn("rnk", row_number().over(perPair))
    // θ = h at rank min(k, n_union): ranks ascend with h, so the max h
    // among ranks ≤ k is exactly the k-th (or last) smallest
    val theta = ranked.groupBy(col("ta"), col("tb"))
      .agg(max(col("rnk")).as("n_union"),
        max(when(col("rnk") <= k, col("h"))).as("theta"))
    val common = ranked.join(theta, Seq("ta", "tb"))
      .groupBy(col("ta"), col("tb"), col("n_union"), col("theta"))
      .agg(sum(when(col("in_a") === 1 && col("in_b") === 1 &&
        (col("n_union") < k || col("h") < col("theta")), 1L).otherwise(0L))
        .as("cnt"))

    val exact = uh.select(col("t").as("xa"), col("h"))
      .join(uh.select(col("t").as("xb"), col("h")), Seq("h"))
      .filter(col("xa") < col("xb"))
      .groupBy(col("xa").as("ta"), col("xb").as("tb"))
      .agg(count(lit(1)).as("n_exact"))

    // θ_frac = (θ + 2^63)/2^64 in doubles — both literals are exact
    // powers of two, every op correctly rounded, so engines agree
    val thetaFrac = (col("theta").cast("double") + lit(9.223372036854775808e18)) /
      lit(1.8446744073709552e19)
    val est = when(col("n_union") < k, col("cnt").cast("double"))
      .otherwise(col("cnt").cast("double") / thetaFrac)
    common.join(exact, Seq("ta", "tb"), "left_outer")
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        col("n_union"), est.as("est"))
      .withColumn("ok",
        col("n_union") < k ||
          (col("est") >= col("n_exact").cast("double") * 0.5 &&
            col("est") <= col("n_exact").cast("double") * 1.5))
      .orderBy(col("type_a"), col("type_b"))
  }
}
