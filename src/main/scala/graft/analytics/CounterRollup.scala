package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable counter-increase state — the ClickHouse `deltaSumTimestamp`
  * / AggregatingMergeTree pattern for the one aggregate a naive rollup
  * gets wrong: counter increase is ORDER-SENSITIVE, so a per-hour state
  * must carry its boundary samples, not just a sum. State per
  * (user, hour) slice: (inner increase, first sample, last sample, n),
  * where first/last are (epoch-us, event_id, cents) structs — min/max
  * mergeable. Two states over DISJOINT time ranges merge exactly:
  * stitched = Σ inner + increase(earlier.last → later.first). That
  * disjointness contract is the same one ClickHouse documents for
  * `deltaSumTimestamp` (and is what time-contiguous micro-batch ingest
  * gives you for free); arbitrary interleaved merges are exactly the
  * case `deltaSum` is documented to get wrong.
  *
  * Scale: state rows are group-cardinality (|users|×|hours|); the merge
  * and serve windows run over STATE rows only — raw events are touched
  * once, at statify time, by the same per-key window as the direct
  * operator. Serving stitches hour rows per user with one lag window and
  * reproduces [[TimeSeries.counterIncrease]] bit-for-bit (same oracle). */
object CounterRollup {

  private val cents = round(col("value") * 100).cast("long")
  private def inc(prev: String, next: String) =
    when(col(s"$next.c") >= col(s"$prev.c"), col(s"$next.c") - col(s"$prev.c"))
      .otherwise(col(s"$next.c"))

  /** Aggregate one time-slice of raw events into per-(user, hour) state. */
  def statify(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("hr")).orderBy(col("x"), col("event_id"))
    events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"),
        unix_micros(col("ts")).as("x"), col("event_id"), cents.as("c"))
      .withColumn("pc", lag(col("c"), 1).over(w))
      .withColumn("step",
        when(col("pc").isNull, 0L)
          .when(col("c") >= col("pc"), col("c") - col("pc"))
          .otherwise(col("c")))
      .groupBy(col("user_id"), col("hr"))
      .agg(
        sum(col("step")).as("inner_inc"),
        min(struct(col("x"), col("event_id").as("id"), col("c"))).as("first_pt"),
        max(struct(col("x"), col("event_id").as("id"), col("c"))).as("last_pt"),
        count(lit(1)).as("n"))
  }

  /** Merge any number of DISJOINT-time-range states per (user, hour):
    * order slices by first sample, stitch each boundary, re-min/max the
    * endpoints. The window runs over state rows (slices per group), never
    * raw events. */
  def mergeStates(states: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("hr")).orderBy(col("first_pt"))
    states
      .withColumn("prev_last", lag(col("last_pt"), 1).over(w))
      .withColumn("boundary",
        when(col("prev_last").isNull, 0L).otherwise(inc("prev_last", "first_pt")))
      .groupBy(col("user_id"), col("hr"))
      .agg(
        (sum(col("inner_inc")) + sum(col("boundary"))).as("inner_inc"),
        min(col("first_pt")).as("first_pt"),
        max(col("last_pt")).as("last_pt"),
        sum(col("n")).as("n"))
  }

  /** Serve per-(user, hour) increase from merged state: stitch consecutive
    * hour rows per user (lag over state rows), a user's first-ever sample
    * counting in full — bit-identical to [[TimeSeries.counterIncrease]]. */
  def serveIncrease(state: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    state
      .withColumn("prev_last", lag(col("last_pt"), 1).over(w))
      .select(col("user_id"), col("hr"),
        (col("inner_inc") +
          when(col("prev_last").isNull, col("first_pt.c"))
            .otherwise(inc("prev_last", "first_pt"))).as("increase_cents"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** [[statify]] with a slice id appended to the state key — statifying N
    * disjoint time slices in ONE scan of the raw events (time cuts become
    * a projection, the window partitions by (user, hour, slice)), instead
    * of one filtered scan per slice. Produces exactly the per-slice states
    * independent statify calls would. */
  def statifySliced(events: DataFrame, cutISO: Seq[String]): DataFrame = {
    require(cutISO == cutISO.sorted, "slice cuts must be ascending")
    val slice = cutISO.zipWithIndex.foldLeft(lit(0)) { case (acc, (cut, i)) =>
      when(col("ts") >= to_timestamp(lit(cut)), lit(i + 1)).otherwise(acc)
    }
    val w = Window.partitionBy(col("user_id"), col("hr"), col("slice"))
      .orderBy(col("x"), col("event_id"))
    events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"), slice.as("slice"),
        unix_micros(col("ts")).as("x"), col("event_id"), cents.as("c"))
      .withColumn("pc", lag(col("c"), 1).over(w))
      .withColumn("step",
        when(col("pc").isNull, 0L)
          .when(col("c") >= col("pc"), col("c") - col("pc"))
          .otherwise(col("c")))
      .groupBy(col("user_id"), col("hr"), col("slice"))
      .agg(
        sum(col("step")).as("inner_inc"),
        min(struct(col("x"), col("event_id").as("id"), col("c"))).as("first_pt"),
        max(struct(col("x"), col("event_id").as("id"), col("c"))).as("last_pt"),
        count(lit(1)).as("n"))
      .drop("slice")
  }

  /** Streaming-upkeep body: fold one micro-batch of raw events into the
    * persisted state table — `statify` the batch, union with the current
    * table, re-merge per (user, hour), swap. Intended as the
    * `foreachBatch` sink of an ingest stream; the disjoint-range merge
    * contract is exactly what event-time-ordered micro-batches provide.
    * N upserts end bit-identical to one batch build (spec-asserted), so
    * [[serveIncrease]] over the table equals the direct operator at any
    * batch granularity. localCheckpoint for the same
    * read-the-table-being-replaced reason as [[MaterializedRollup
    * .upsertDelta]]. */
  def upsertState(spark: org.apache.spark.sql.SparkSession, table: String,
      batchEvents: DataFrame): Unit = {
    val delta = statify(batchEvents)
    val merged =
      if (spark.catalog.tableExists(table))
        mergeStates(spark.table(table).unionByName(delta))
      else mergeStates(delta)
    MaterializedRollup.writeTable(merged.localCheckpoint(), table)
  }

  /** End-to-end MV query: build per-slice states (one raw scan, the
    * micro-batch analogue), merge, serve — proves slice-count invariance
    * against the direct operator's oracle. */
  def increaseFromSlices(events: DataFrame, cutISO: Seq[String]): DataFrame =
    serveIncrease(mergeStates(statifySliced(events, cutISO)))
}
