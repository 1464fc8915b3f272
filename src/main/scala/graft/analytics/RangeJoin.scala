package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without an equi key, by time-bucket co-location.
  *
  * `point BETWEEN start AND end` with no shared key is a non-equi
  * predicate: Catalyst can only plan it as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side fits in memory) — O(|points| ×
  * |intervals|) predicate evaluations, the classic 100 TB cliff. The
  * standard scale-out shape (used by Flink's interval join and most
  * warehouse range-join rewrites) turns it into an *equi* join on a
  * derived time bucket:
  *
  *   - every point belongs to exactly ONE bucket of width `w` seconds
  *     (`floor(epoch / w)`), so the points side never duplicates;
  *   - every interval is exploded to the buckets it overlaps —
  *     `ceil(len / w) + 1` rows at most, a small constant when the caller
  *     picks `w` at or above the typical interval length;
  *   - an inner equi-join on the bucket plus the original range predicate
  *     as a residual filter gives exactly the interval-join semantics
  *     with no distinct/dedup step (one bucket per point ⇒ one joined row
  *     per matching pair).
  *
  * The equi-join shuffles both sides by bucket — partitioning that sizes
  * with the data, composes with AQE (skewed buckets split at runtime),
  * and keeps each task's work proportional to the points and intervals
  * that genuinely overlap in time. Reference analogue: ClickHouse serves
  * such "events inside incident windows" queries per-shard with its
  * primary-key range index; the bucket key is the shuffle-native
  * equivalent of that range pruning.
  */
object RangeJoin {

  /** Inner join of `points` rows to every `intervals` row whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`. All three are
    * timestamp columns. `bucketSeconds` is the co-location bucket width:
    * correctness holds for any positive value (the residual filter is
    * exact); efficiency wants it ≥ the typical interval length so each
    * interval explodes into ≤ 2 buckets. Output columns = points ++
    * intervals (bucket bookkeeping dropped). Intervals with
    * `end < start` match nothing. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val w = lit(bucketSeconds.toDouble)
    // epoch seconds stay well under 2^53, so double floor-division is exact
    val pts = points.withColumn("_rj_bucket",
      floor(unix_timestamp(col(pointCol)) / w).cast("long"))
    val ivs = intervals
      // a reversed interval would make sequence() count DOWN and fabricate
      // buckets; matches are impossible anyway, so drop the row up front
      .where(col(endCol) >= col(startCol))
      .withColumn("_rj_bucket", explode(sequence(
        floor(unix_timestamp(col(startCol)) / w).cast("long"),
        floor(unix_timestamp(col(endCol)) / w).cast("long"))))
    pts.join(ivs, Seq("_rj_bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_rj_bucket")
  }

  /** Registry query: shipments landing inside 7-day "promo windows" (one
    * window per sampled order, `[o_orderdate, o_orderdate + 6d]`), counted
    * per window. Pure range predicate — no shared key between the window
    * table and lineitem — so the naive plan is a nested loop; this runs as
    * a bucketed equi-join instead. */
  def shipmentsInWindows(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val windows = orders
      .where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 6 DAYS")).as("w_end"))
    val pts = lineitem.select("l_shipdate", "l_quantity")
    pointInInterval(pts, windows, "l_shipdate", "w_start", "w_end",
      bucketSeconds = 7L * 86400L)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_ship"), graft.Cols.dsum(col("l_quantity")).as("sum_qty"))
  }
}
