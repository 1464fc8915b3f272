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
}
