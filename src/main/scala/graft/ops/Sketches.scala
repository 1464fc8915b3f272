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
}
