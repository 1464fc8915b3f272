package graft.analytics

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed UDAF tier: per-key top-k as an [[Aggregator]] with a bounded
  * buffer — the scale path for "top events per user". A ranking window
  * sorts every key's full row set; this aggregator keeps only k rows per
  * key through the map-side partial aggregation, so the shuffle carries
  * ≤ k rows per key instead of all of them. Same results (and the same
  * DuckDB oracle) as [[Analytics.topEventsPerUser]].
  */
object TopKAggregator {

  final case class Ev(user_id: Long, event_id: Long, event_type: String, value: Double)

  /** Keeps the k largest by (value desc, event_id asc). Buffer is a small
    * sorted seq — O(k) merge per row; mergeable, so partial aggregation
    * runs map-side before the shuffle. */
  final class TopK(k: Int, enc: Encoder[Seq[Ev]]) extends Aggregator[Ev, Seq[Ev], Seq[Ev]] {
    private def better(a: Ev, b: Ev): Boolean =
      a.value > b.value || (a.value == b.value && a.event_id < b.event_id)

    override def zero: Seq[Ev] = Nil
    override def reduce(buf: Seq[Ev], e: Ev): Seq[Ev] = insert(buf, e)
    override def merge(a: Seq[Ev], b: Seq[Ev]): Seq[Ev] = b.foldLeft(a)(insert)
    override def finish(buf: Seq[Ev]): Seq[Ev] = buf

    private def insert(buf: Seq[Ev], e: Ev): Seq[Ev] = {
      val (before, after) = buf.span(better(_, e))
      (before ++ (e +: after)).take(k)
    }

    override def bufferEncoder: Encoder[Seq[Ev]] = enc
    override def outputEncoder: Encoder[Seq[Ev]] = enc
  }

  /** DataFrame-level API matching [[Analytics.topEventsPerUser]]'s output
    * (user_id, event_id, event_type, value, rank). */
  def topEventsPerUser(events: DataFrame, k: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val agg = new TopK(k, implicitly[Encoder[Seq[Ev]]])
    events
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .agg(agg.toColumn.name("top"))
      .flatMap { case (uid, top) =>
        top.zipWithIndex.map { case (e, i) =>
          (uid, e.event_id, e.event_type, e.value, (i + 1).toLong)
        }
      }
      .toDF("user_id", "event_id", "event_type", "value", "rank")
      .orderBy(col("user_id"), col("rank"))
  }
}
