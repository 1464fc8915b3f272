package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable total-order ranking: global ROW_NUMBER / NTILE without a
  * single-partition window.
  *
  * `ntile(n).over(Window.orderBy(...))` — the natural spelling — plans as
  * `WindowExec: No Partition Defined`: every row moves to ONE task, which
  * caps the operator at one core and one executor's memory regardless of
  * cluster size. The scalable construction used here is the classic
  * range-partitioned rank:
  *
  *  1. `repartitionByRange` on the sort key — rows land in globally ordered
  *     partition ranges (ONE exchange of the data, total).
  *  2. `sortWithinPartitions` + `monotonically_increasing_id()` — the id's
  *     documented layout (partition index in the upper 31 bits, record
  *     offset within the partition in the lower 33) yields the partition
  *     ordinal and the local 1-based rank with zero additional exchange.
  *     (The previous formulation ranked with
  *     `Window.partitionBy(partition-id)`, which hash-exchanged the whole
  *     dataset a second time — RangePartitioning does not satisfy a
  *     HashPartitioning requirement.)
  *  3. per-partition row counts → prefix-sum offsets. This window IS
  *     single-partition, but over `numPartitions` rows (thousands at most),
  *     not the data.
  *  4. broadcast the offsets back; global rank = offset + local rank, and
  *     NTILE follows arithmetically from (rank, total).
  *
  * Determinism notes: `RangePartitioner`'s boundary sampling is seeded by
  * partition index, so both evaluations of the repartitioned child (ranks
  * and counts) see identical boundaries even if the exchange is recomputed
  * rather than reused; `sortCols` must be a total order (include a unique
  * tie-break) so the within-partition order is unique.
  *
  * Cost note: the constructions reference their input subplan from several
  * consumers (ranks, offsets, peer frames). Exchange reuse deduplicates
  * the shuffles when AQE canonicalization allows, but the subplan BELOW
  * the first exchange can still evaluate once per consumer — callers
  * whose input frame is expensive (a wide scan or a heavy aggregation)
  * should persist or checkpoint it before ranking if they cannot afford
  * the recompute. The registered queries' inputs are post-aggregation
  * frames, where the recompute is cheap by construction.
  */
object GlobalRank {

  /** Append a global 1-based BIGINT `rankCol` ordered by `sortCols`, plus a
    * hidden total count used by [[withNtile]]. `sortCols` must be a total
    * order (include a unique tie-break). */
  private def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column],
      rankCol: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("_gr_")),
      "input already has _gr_-prefixed working columns")
    // shuffle.partitions may be non-numeric on some platforms ("auto");
    // fall back rather than NumberFormatException at plan construction.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
      .toIntOption.filter(_ > 0)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val parted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_gr_id", monotonically_increasing_id())
      .withColumn("_gr_pid", shiftrightunsigned(col("_gr_id"), 33))
      .withColumn("_gr_rn", col("_gr_id").bitwiseAND(lit((1L << 33) - 1)) + 1L)
      .drop("_gr_id")
    // numPartitions rows — the only single-partition window, O(partitions)
    val w = Window.orderBy(col("_gr_pid"))
    val offsets = parted
      .groupBy(col("_gr_pid"))
      .agg(count(lit(1)).as("_gr_cnt"))
      .select(
        col("_gr_pid"),
        coalesce(sum(col("_gr_cnt")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("_gr_off"),
        sum(col("_gr_cnt")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("_gr_total"))
    parted
      .join(broadcast(offsets), "_gr_pid")
      .withColumn(rankCol, col("_gr_off") + col("_gr_rn"))
      .drop("_gr_pid", "_gr_rn", "_gr_off")
  }

  /** Append a global 1-based BIGINT ROW_NUMBER column ordered by
    * `sortCols` — scalable alternative to
    * `row_number().over(Window.orderBy(...))`. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column], rankCol: String): DataFrame =
    withGlobalRowNumber(df, sortCols, rankCol).drop("_gr_total")

  /** Append the full SQL ranking-function family over a global order —
    * RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST — without a data-sized
    * single-partition window.
    *
    * `valueSort` are the ORDER BY expressions (e.g. `col("spend").desc`)
    * whose distinct values define peer groups; `valueNames` are the same
    * columns' plain names (used for the peer aggregation and join-back);
    * `tieBreak` extends the order to a total one so the underlying row
    * number is deterministic (tie-break columns do NOT affect peer
    * grouping, matching SQL window semantics where peers are rows equal on
    * the ORDER BY keys — here the keys in `valueSort`).
    *
    * Construction (all shuffles are keyed exchanges; the only
    * single-partition windows are the O(numPartitions) offset frames):
    *  1. global row number `rn` over (valueSort ++ tieBreak) — one range
    *     exchange (peers land adjacent).
    *  2. peer frame: groupBy(valueNames) → (min rn, max rn) — a keyed
    *     aggregation, one row per distinct value. RANK = min rn of the
    *     peer group; CUME_DIST = max rn / total (exact SQL semantics).
    *  3. DENSE_RANK = ordinal of the peer group = global row number of
    *     the peer frame ordered by its min rn — the same range-partitioned
    *     construction recursed onto the (distinct-values-sized) frame.
    *  4. join the peer columns back on the value keys; PERCENT_RANK =
    *     (rank−1)/(total−1), 0 when total = 1.
    *
    * The rational ranks divide exactly the same integers on any engine, so
    * the double results are bit-identical across Spark and DuckDB. */
  def withRankFamily(df: DataFrame, valueSort: Seq[Column], valueNames: Seq[String],
      tieBreak: Seq[Column], rankCol: String = "rank",
      denseRankCol: String = "dense_rank", percentRankCol: String = "percent_rank",
      cumeDistCol: String = "cume_dist"): DataFrame = {
    require(!df.columns.exists(_.startsWith("_rf_")),
      "input already has _rf_-prefixed working columns")
    val ranked = withGlobalRowNumber(df, valueSort ++ tieBreak, "_rf_rn")
      .withColumnRenamed("_gr_total", "_rf_total")
    val peers = ranked
      .groupBy(valueNames.map(col): _*)
      .agg(min(col("_rf_rn")).as("_rf_minrn"), max(col("_rf_rn")).as("_rf_maxrn"))
    val peersDense = withRowNumber(peers, Seq(col("_rf_minrn")), "_rf_dense")
    ranked
      .join(peersDense, valueNames)
      .withColumn(rankCol, col("_rf_minrn"))
      .withColumn(denseRankCol, col("_rf_dense"))
      .withColumn(percentRankCol,
        when(col("_rf_total") === 1L, lit(0.0))
          .otherwise((col("_rf_minrn") - 1L).cast("double") /
            (col("_rf_total") - 1L).cast("double")))
      .withColumn(cumeDistCol,
        col("_rf_maxrn").cast("double") / col("_rf_total").cast("double"))
      .drop("_rf_rn", "_rf_minrn", "_rf_maxrn", "_rf_dense", "_rf_total")
  }

  /** Append a global BIGINT running total of `valueCol` (inclusive of the
    * current row) over the total order `sortCols` — the scalable spelling
    * of `SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`, whose
    * naive form moves every row to ONE task.
    *
    * Construction: the [[withGlobalRowNumber]] range partitioning, a
    * PARTITION-LOCAL cumulative window keyed on the partition ordinal
    * (one keyed hash exchange — rows of a partition stay together, every
    * core busy), per-partition value sums prefix-summed over the
    * O(numPartitions) offset frame, and a broadcast join back:
    * total = partition prefix + local cumsum. Integer-only — exact and
    * engine-stable at any size (a double accumulation would be
    * order-sensitive). */
  def withRunningTotalLong(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      outCol: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("_gr_")),
      "input already has _gr_-prefixed working columns")
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
      .toIntOption.filter(_ > 0)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val parted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_gr_id", monotonically_increasing_id())
      .withColumn("_gr_pid", shiftrightunsigned(col("_gr_id"), 33))
      .withColumn("_gr_rn", col("_gr_id").bitwiseAND(lit((1L << 33) - 1)))
      .withColumn("_gr_v", valueCol.cast("long"))
      .drop("_gr_id")
    val localW = Window.partitionBy(col("_gr_pid")).orderBy(col("_gr_rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_gr_lcum", sum(col("_gr_v")).over(localW))
    // numPartitions rows — the only single-partition window
    val offW = Window.orderBy(col("_gr_pid"))
    val offsets = parted
      .groupBy(col("_gr_pid"))
      .agg(sum(col("_gr_v")).as("_gr_psum"))
      .select(col("_gr_pid"),
        coalesce(sum(col("_gr_psum")).over(
          offW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("_gr_voff"))
    local
      .join(broadcast(offsets), "_gr_pid")
      .withColumn(outCol, col("_gr_voff") + col("_gr_lcum"))
      .drop("_gr_pid", "_gr_rn", "_gr_v", "_gr_lcum", "_gr_voff")
  }

  /** Append a global BIGINT NTILE(`n`) column ordered by `sortCols`:
    * the first `total mod n` buckets get `ceil(total/n)` rows, the rest
    * `floor(total/n)` — SQL NTILE semantics, derived arithmetically from
    * the global row number. */
  def withNtile(df: DataFrame, n: Int, sortCols: Seq[Column], ntileCol: String): DataFrame = {
    require(n >= 1, s"NTILE bucket count must be >= 1, got $n")
    val ranked = withGlobalRowNumber(df, sortCols, "_gr_rank")
    // integer DIV throughout — exact at any total, unlike double division
    ranked
      .withColumn("_gr_base", expr(s"_gr_total DIV $n"))
      .withColumn("_gr_cut", expr(s"(_gr_total % $n) * (_gr_base + 1)"))
      .withColumn("_gr_rn0", col("_gr_rank") - 1)
      .withColumn(ntileCol, expr(
        s"""CAST(IF(_gr_rn0 < _gr_cut,
           |        _gr_rn0 DIV (_gr_base + 1),
           |        (_gr_total % $n) + (_gr_rn0 - _gr_cut) DIV GREATEST(_gr_base, 1))
           |     + 1 AS BIGINT)""".stripMargin))
      .drop("_gr_rank", "_gr_total", "_gr_base", "_gr_cut", "_gr_rn0")
  }
}
