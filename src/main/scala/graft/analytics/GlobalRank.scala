package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, GraftGlue}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable total-order ranking: global ROW_NUMBER / NTILE / running totals
  * without a data-sized single-partition window.
  *
  * `ntile(n).over(Window.orderBy(...))` — the natural spelling — plans as
  * `WindowExec: No Partition Defined`: every row moves to ONE task, which
  * caps the operator at one core and one executor's memory regardless of
  * cluster size. The constructions here instead split the order into
  * contiguous buckets, rank/cumulate within each bucket in parallel, and
  * stitch buckets together with an O(#buckets) prefix frame.
  *
  * Bucket assignment is a VALUE-deterministic function of the row — this is
  * the load-bearing design decision. The obvious alternative,
  * `repartitionByRange` + `monotonically_increasing_id`, derives a row's
  * bucket from reservoir-sampled range boundaries, and the reservoir
  * samples the transient ROW ORDER of the child — which is not stable
  * across materializations (shuffle fetch order varies run to run, and
  * column pruning gives the construction's two consumers — the local
  * cumulative pass and the per-bucket offset pass — differently-pruned,
  * therefore non-reusable, exchanges). Two consumers then disagree about
  * which bucket a row is in and the stitched totals are silently wrong.
  * Deriving the bucket from the row's VALUES makes every materialization
  * agree by construction, with no reliance on exchange reuse, AQE stage
  * caching, or checkpointing.
  *
  * Boundary selection: a 1-in-[[SampleMod]] hash-deterministic sample of
  * the key tuples (`xxhash64(keys) % SampleMod == 0` — a fixed predicate,
  * not a seeded RNG), ranked on ONE explicitly-declared single bucket
  * (O(n / SampleMod) rows — at 10⁹ distinct keys that is a 4M-row sort on
  * one task; raise SampleMod for larger domains), then every
  * (sample-size DIV target-buckets)-th key becomes a boundary. A row's
  * bucket is the count of boundaries strictly before it in the requested
  * sort order (direction-aware lexicographic comparison against a
  * broadcast boundary array). Small frames degrade gracefully: an empty
  * sample yields one bucket, which is correct and cheap precisely because
  * the frame is small.
  *
  * `sortCols` must be a total order within each group (include a unique
  * tie-break; the registered callers feed post-`groupBy(sortCols)` frames,
  * where uniqueness holds by construction) and sort keys should be
  * non-null. Mixed asc/desc is supported (`col.desc` SortOrder columns).
  */
object GlobalRank {

  /** Boundary sampling rate: ~SampleMod rows per sampled key keeps the
    * single-task boundary sort at n/SampleMod rows while still giving
    * ~(n / SampleMod / buckets) samples per boundary decision. */
  private val SampleMod = 256L

  /** Constant-0 partition key the optimizer CANNOT fold away. A window
    * that is deliberately single-bucket (the O(#buckets) offset frames,
    * the O(n/SampleMod) boundary samples, codebook seeds) should DECLARE
    * that bucket rather than run unpartitioned — but Spark 4's
    * `EliminateWindowPartitions` rule strips FOLDABLE partition
    * expressions, so `partitionBy(lit(0))` silently reverts to the
    * unpartitioned plan (and its one-task degradation WARN). A zero-arg
    * Scala UDF returning 0 is non-foldable (Catalyst never constant-folds
    * UDFs), so the declared bucket survives optimization, yet it stays
    * DETERMINISTIC — unlike a `rand()*0` workaround, which would poison
    * every enclosing subplan for dynamic partition pruning and
    * pushdown-through-project (the PartitionPruning rule requires a
    * deterministic dim subplan; measured: q_partition_prune lost its
    * dynamicpruning filter under rand). The exchange it induces hashes
    * every row to one partition — the intended, documented shape; callers
    * only use it on bounded frames. */
  private[graft] def singleBucket: Column = {
    val zero = udf(() => 0L)
    zero()
  }

  private case class Key(name: String, source: Column, asc: Boolean)

  /** Decompose a possibly-`.desc`/`.asc` sort Column into (expression,
    * direction); plain columns default ascending. */
  private def keyOf(c: Column, i: Int): Key = GraftGlue.sortOrderParts(c) match {
    case Some((child, asc)) => Key(s"_gr_k$i", child, asc)
    case None               => Key(s"_gr_k$i", c, asc = true)
  }

  private def sortOrderCols(keys: Seq[Key]): Seq[Column] =
    keys.map(k => if (k.asc) col(k.name).asc else col(k.name).desc)

  private def parts(df: DataFrame): Int =
    // shuffle.partitions may be non-numeric on some platforms ("auto");
    // fall back rather than NumberFormatException at plan construction.
    df.sparkSession.conf.get("spark.sql.shuffle.partitions")
      .toIntOption.filter(_ > 0)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)

  /** Append `_gr_bucket`: the row's contiguous range-bucket ordinal under
    * the keys' sort order, assigned value-deterministically (see object
    * doc). Key columns are materialized under `keys(i).name`. */
  private def withBucket(df: DataFrame, keys: Seq[Key], nBuckets: Int): DataFrame = {
    val withKeys = keys.foldLeft(df)((d, k) => d.withColumn(k.name, k.source))
    val keyCols = keys.map(k => col(k.name))
    // one explicit bucket: the sample is O(n / SampleMod), not the data
    val wOne = Window.partitionBy(GlobalRank.singleBucket)
    val bounds = withKeys
      .select(keyCols: _*)
      .filter(pmod(xxhash64(keyCols: _*), lit(SampleMod)) === 0L)
      .withColumn("_gr_srk",
        row_number().over(wOne.orderBy(sortOrderCols(keys): _*)).cast("long"))
      .withColumn("_gr_sn", count(lit(1)).over(wOne))
      .filter(col("_gr_srk") % expr(s"GREATEST(_gr_sn DIV $nBuckets, 1L)") === 0L)
      .select(struct(keyCols: _*).as("_gr_b"))
    val barr = bounds.agg(collect_list(col("_gr_b")).as("_gr_barr"))
    // direction-aware lexicographic "boundary strictly precedes this row"
    def boundaryBefore(b: Column): Column =
      keys.foldRight(lit(false): Column) { (k, acc) =>
        val bf = b.getField(k.name)
        val lt = if (k.asc) bf < col(k.name) else bf > col(k.name)
        lt || (bf === col(k.name) && acc)
      }
    withKeys
      .crossJoin(broadcast(barr))
      .withColumn("_gr_bucket",
        size(filter(col("_gr_barr"), boundaryBefore(_))).cast("long"))
      .drop("_gr_barr")
  }

  /** Append a global 1-based BIGINT `rankCol` ordered by `sortCols`, plus a
    * hidden `_gr_total` count used by [[withNtile]]. `sortCols` must be a
    * total order (include a unique tie-break). */
  private def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column],
      rankCol: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("_gr_")),
      "input already has _gr_-prefixed working columns")
    val keys = sortCols.zipWithIndex.map { case (c, i) => keyOf(c, i) }
    val bucketed = withBucket(df, keys, parts(df))
    val localW = Window.partitionBy(col("_gr_bucket"))
      .orderBy(sortOrderCols(keys): _*)
    val local = bucketed
      .withColumn("_gr_rn", row_number().over(localW).cast("long"))
    // O(#buckets) rows — the only single-partition frame, explicit bucket
    val offW = Window.partitionBy(singleBucket).orderBy(col("_gr_bucket"))
    val offsets = bucketed
      .groupBy(col("_gr_bucket"))
      .agg(count(lit(1)).as("_gr_cnt"))
      .select(
        col("_gr_bucket"),
        coalesce(sum(col("_gr_cnt")).over(offW.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("_gr_off"),
        sum(col("_gr_cnt")).over(
          offW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("_gr_total"))
    local
      .join(broadcast(offsets), "_gr_bucket")
      .withColumn(rankCol, col("_gr_off") + col("_gr_rn"))
      .drop(("_gr_bucket" +: "_gr_rn" +: "_gr_off" +: keys.map(_.name)): _*)
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
    * single-partition frames are the O(#buckets) offset frames and the
    * boundary samples):
    *  1. global row number `rn` over (valueSort ++ tieBreak) — value-
    *     deterministic bucketed ranking (peers land adjacent).
    *  2. peer frame: groupBy(valueNames) → (min rn, max rn) — a keyed
    *     aggregation, one row per distinct value. RANK = min rn of the
    *     peer group; CUME_DIST = max rn / total (exact SQL semantics).
    *  3. DENSE_RANK = ordinal of the peer group = global row number of
    *     the peer frame ordered by its min rn — the same bucketed
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
    * naive form moves every row to ONE task. */
  def withRunningTotalLong(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      outCol: String): DataFrame =
    withRunningTotalsLong(df, Nil, sortCols, Seq(valueCol -> outCol))

  /** The general form of [[withRunningTotalLong]]: running BIGINT totals of
    * several value columns at once, optionally PER GROUP — the scalable
    * spelling of `SUM(v_i) OVER (PARTITION BY g ORDER BY ... ROWS UNBOUNDED
    * PRECEDING)` for any number of `v_i` sharing one order, including the
    * low-cardinality-group case (a handful of groups over billions of rows)
    * where `Window.partitionBy(g).orderBy(...)` degenerates to one task per
    * group.
    *
    * Construction: value-deterministic range buckets over
    * (groupCols ++ sortCols) — a group may span several buckets; that is
    * the point — then a bucket-LOCAL cumulative window keyed on
    * (bucket, group), per-(bucket, group) sums prefix-summed over an
    * O(#buckets · groups) frame keyed by group (explicit single bucket when
    * ungrouped), and a broadcast join back on (bucket, group):
    * total_i = group's prefix from earlier buckets + local cumsum_i.
    * Every stitched quantity is a function of row values, so the
    * construction's independent consumers agree (see object doc); all
    * arithmetic is integer-only — exact and engine-stable at any size. */
  def withRunningTotalsLong(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], values: Seq[(Column, String)]): DataFrame = {
    require(values.nonEmpty, "need at least one (value, outCol)")
    require(!df.columns.exists(_.startsWith("_gr_")),
      "input already has _gr_-prefixed working columns")
    val groups = groupCols.map(col)
    val sortKeys = sortCols.zipWithIndex.map { case (c, i) => keyOf(c, i) }
    // group columns join the bucket key under their own names (ascending;
    // any stable direction works — buckets only need to respect the order)
    val allKeys = groupCols.map(g => Key(g, col(g), asc = true)) ++ sortKeys
    val withVals = values.zipWithIndex.foldLeft(df) { case (d, ((v, _), i)) =>
      d.withColumn(s"_gr_v$i", v.cast("long"))
    }
    val bucketed = withBucket(withVals, allKeys, parts(df))
    val localW = Window.partitionBy((col("_gr_bucket") +: groups): _*)
      .orderBy(sortOrderCols(sortKeys): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = values.indices.foldLeft(bucketed) { (d, i) =>
      d.withColumn(s"_gr_lcum$i", sum(col(s"_gr_v$i")).over(localW))
    }
    // O(#buckets · groups) rows; keyed by group when grouped
    val offW = (if (groups.isEmpty) Window.partitionBy(GlobalRank.singleBucket)
                else Window.partitionBy(groups: _*))
      .orderBy(col("_gr_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sums = bucketed
      .groupBy((col("_gr_bucket") +: groups): _*)
      .agg(sum(col("_gr_v0")).as("_gr_psum0"),
        values.indices.tail.map(i => sum(col(s"_gr_v$i")).as(s"_gr_psum$i")): _*)
    val offsets = values.indices.foldLeft(sums) { (d, i) =>
      d.withColumn(s"_gr_voff$i",
        coalesce(sum(col(s"_gr_psum$i")).over(offW), lit(0L)))
    }.drop(values.indices.map(i => s"_gr_psum$i"): _*)
    val joined = local.join(broadcast(offsets), "_gr_bucket" +: groupCols)
    val out = values.zipWithIndex.foldLeft(joined) { case (d, ((_, name), i)) =>
      d.withColumn(name, col(s"_gr_voff$i") + col(s"_gr_lcum$i"))
    }
    out.drop(("_gr_bucket" +: sortKeys.map(_.name)) ++
      values.indices.flatMap(i => Seq(s"_gr_v$i", s"_gr_lcum$i", s"_gr_voff$i")): _*)
  }

  /** Domain size under which [[withRunningTotalsLongAdaptive]] skips the
    * bucketed stitch: a 65k-row cumulative window on one declared task is
    * sub-millisecond, while the stitch costs ~10 scheduler stages
    * (boundary sample windows, offset frames, two broadcast joins) —
    * pure fixed overhead at toy domains. */
  private[graft] val SmallDomainRows = 65536L

  /** [[withRunningTotalsLong]] with a DOMAIN-ADAPTIVE fast path for
    * per-value aggregated frames (the de-windowed stats callers: ECDFs,
    * midranks, counting percentiles — frames with one row per DISTINCT
    * value, whose size is the value domain, not the data).
    *
    * The frame is snapshotted with an eager `localCheckpoint` FIRST, so
    * the probe (`count()` on the snapshot) and the totals both read
    * materialized rows — the upstream derivation (a keyed aggregation,
    * possibly over an expensive parent like sessionization) runs exactly
    * once, not once per consumer. Below [[SmallDomainRows]] the running
    * totals run as a cumulative window over ONE DECLARED bucket per
    * group ([[singleBucket]] when ungrouped): exactly the plan the
    * scalable construction is protecting against at data scale, and
    * exactly the right plan when the whole domain fits one task. At or
    * above the threshold the value-deterministic bucketed construction
    * runs unchanged over the same snapshot — so the shape stays flat as
    * the domain grows across the threshold, and both branches are exact
    * integer arithmetic over the same order (identical output,
    * oracle-checked either way). Snapshot storage is bounded by the
    * distinct-value domain (executor-local blocks), which is the frame
    * class this API is for; callers whose frame can be data-sized
    * (running revenue over raw rows) should call
    * [[withRunningTotalsLong]] directly. */
  def withRunningTotalsLongAdaptive(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], values: Seq[(Column, String)]): DataFrame = {
    val snap = df.localCheckpoint(true)
    if (snap.count() < SmallDomainRows) {
      val localW = (if (groupCols.isEmpty) Window.partitionBy(singleBucket)
                    else Window.partitionBy(groupCols.map(col): _*))
        .orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      values.foldLeft(snap) { case (d, (v, name)) =>
        d.withColumn(name, sum(v.cast("long")).over(localW))
      }
    } else withRunningTotalsLong(snap, groupCols, sortCols, values)
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
