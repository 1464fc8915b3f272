package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.logs.{LogSchema, LogTable}

/** Streaming ingestion path — the reference's batcher + async insert
  * (internal/batcher/batcher.go:43-76, internal/service/service.go:21-47)
  * re-expressed as Structured Streaming.
  *
  * Mapping (SURVEY.md §2.6):
  *  - T1 size/time micro-batcher (flush at 500 rows or 100 ms) → the
  *    micro-batch engine itself with `Trigger.ProcessingTime(100 ms)`; the
  *    size bound is source-side admission (`maxFilesPerTrigger` etc.).
  *  - T2 async best-effort flush (fire-and-forget goroutine, errors
  *    dropped — batcher.go:51-60) → `foreachBatch` append. Spark's
  *    checkpointing deliberately *upgrades* this to at-least-once; the
  *    observable contract (ack = accepted count, not persisted count) is
  *    unchanged.
  *  - T3 producer backpressure (blocking channel send, batcher.go:34-40) →
  *    trigger-paced source admission.
  *
  * No watermarks or event-time state: the reference has none (§2.6) — late
  * rows land with whatever ts they carry (or now() if unparseable,
  * service.go:32).
  */
object LogStream {

  /** S1 ack envelope: `BatchWriteResponse{written}` — the count of entries
    * ACCEPTED into the stream, not the count persisted. The reference acks
    * `written = len(entries)` the moment the batch clears the channel send
    * (internal/service/service.go:45-46, proto/log.proto:16-21), before
    * the async flush ever runs; durability is a later, unacknowledged
    * event. */
  final case class BatchWriteResponse(written: Long)

  /** Admit a batch of wire rows into a streaming source and ack
    * immediately with the accepted count — decoupled from any sink commit
    * (the micro-batch that persists these rows runs later, on the stream's
    * own trigger). The memory-backed source stands in for the gRPC
    * endpoint; the ack contract is the part of S1 with analytic content. */
  def batchWrite[A](
      source: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[A],
      entries: Seq[A]): BatchWriteResponse = {
    if (entries.nonEmpty) source.addData(entries)
    BatchWriteResponse(entries.length)
  }

  /** Wire-shaped stream (ts string, attrs map — [[LogSchema.wireSchema]]) →
    * normalize → partitioned parquet append in the [[LogTable]] layout. */
  def ingest(
      wire: DataFrame,
      tablePath: String,
      checkpointPath: String,
      maxDelayMs: Long = 100L): StreamingQuery =
    LogSchema.normalize(wire)
      .writeStream
      .trigger(Trigger.ProcessingTime(s"$maxDelayMs milliseconds"))
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LogTable.append(batch, tablePath)
      }
      .start()
}
