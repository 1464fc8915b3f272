package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Cols.dsum

/** Event-time streaming analytics over the events stream — the operators
  * the reference lacks entirely (§2.6: no watermarks/windows there) but a
  * log-analytics engine at scale needs: windowed aggregation with late-data
  * bounds and stream-side sessionless rollups.
  *
  * The transformation is shared with the batch path
  * ([[graft.analytics.Analytics2.tumblingCounts]] is the batch shape of
  * [[windowedCounts]]), which is what makes the results testable: run the
  * same frame through `readStream` and `read` and compare.
  */
object EventStream {

  /** Tumbling event-time windows with a watermark. On a stream, rows later
    * than `watermark` behind the max seen ts are dropped and finalized
    * windows emit exactly once (append mode); on a batch frame the same
    * expression degrades to a plain grouped aggregation. */
  def windowedCounts(events: DataFrame, windowLen: String = "6 hours",
      watermark: String = "1 hour"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"))
  }

  /** LIVE log-template mining: the streaming twin of
    * [[graft.ops.TextAnalysis.logTemplates]] — mask numeric runs, keep the
    * `prefixTokens`-token prefix, and maintain running per-template
    * message/key counts as the stream arrives (update mode; the state is
    * one row per template, which is exactly why template mining is the
    * form of log analytics that CAN run unbounded — raw-message state
    * could not). Identical masking expression as the batch operator, so
    * stream-vs-batch parity is assertable row-for-row; distinct-key
    * counting is approximated by `approx_count_distinct` on the stream
    * (exact distinct over unbounded keys would grow state without bound —
    * the spec compares it against the batch exact count under its
    * documented error). Frame needs (msg, group_key, ts). */
  def templateCounts(frame: DataFrame, prefixTokens: Int = 8): DataFrame = {
    val tpl = array_join(
      slice(split(trim(regexp_replace(col("msg"), "[0-9]+", "<num>")), "\\s+"),
        1, prefixTokens), " ")
    frame
      .select(tpl.as("template"), col("group_key"), col("ts"))
      .groupBy(col("template"))
      .agg(
        count(lit(1)).as("n_msgs"),
        approx_count_distinct(col("group_key")).as("n_keys_approx"),
        min(col("ts")).as("first_seen"),
        max(col("ts")).as("last_seen"))
  }
}
