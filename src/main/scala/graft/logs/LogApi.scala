package graft.logs

import java.sql.Timestamp
import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Row}

/** String-typed query-parameter layer — the part of `/v1/logs` validation
  * that happens before types exist (internal/api/api.go:31-106), so the
  * full V1-V8 contract is reproducible:
  *
  *  - V2 `service` required → 400 (api.go:41-46)
  *  - V3 `from`/`to` must parse RFC3339 → 400 (api.go:48-63); absent
  *    bounds default to [epoch, now] like the Go zero-value time handling
  *  - V4 `limit` positive int, default 100 (api.go:72-82)
  *  - V5 `from <= to` (api.go:85-89)
  *  - V7 response envelope {logs, count, query} (api.go:108-119)
  *
  * (V1 GET-only, V6 30s timeout, V8 health endpoints are HTTP-server
  * concerns with no analytic content; the timeout maps to
  * `spark.sparkContext.setJobGroup` + cancellation in a real service.)
  */
object LogApi {

  /** Parse + validate raw string params into [[LogQueryParams]]. */
  def parseParams(params: Map[String, String]): Either[String, LogQueryParams] = {
    val service = params.getOrElse("service", "")
    if (service.isEmpty) return Left("service parameter is required")

    def parseTs(key: String, default: Timestamp): Either[String, Timestamp] =
      params.get(key).filter(_.nonEmpty) match {
        case None => Right(default)
        case Some(s) =>
          try Right(Timestamp.from(
            OffsetDateTime.parse(s, DateTimeFormatter.ISO_OFFSET_DATE_TIME).toInstant))
          catch { case _: Exception => Left(s"invalid $key: must be RFC3339") }
      }

    for {
      from <- parseTs("from", new Timestamp(0L))
      to <- parseTs("to", new Timestamp(System.currentTimeMillis()))
      limit <- params.get("limit").filter(_.nonEmpty) match {
        case None => Right(100)
        case Some(s) =>
          s.toIntOption.filter(_ > 0).toRight("limit must be a positive integer")
      }
      p <- LogQuery.validate(LogQueryParams(
        service, from, to,
        level = params.get("level").filter(_.nonEmpty),
        user = params.get("user").filter(_.nonEmpty),
        limit = limit))
    } yield p
  }

  /** Typed query failure, so the transport can answer the reference's
    * status codes faithfully: validation failures are client errors → 400
    * (api.go:41-89), while a query-side failure — including the V6 timeout,
    * Go's context deadline on the DB call — is `http.Error(w, "Internal
    * server error", 500)` (api.go:99-103). */
  sealed trait Failure { def message: String }
  /** V2-V5 parameter rejection → HTTP 400 with the reason. */
  final case class BadRequest(message: String) extends Failure
  /** Query execution failure (V6 timeout, engine error) → HTTP 500. */
  final case class ServerError(message: String) extends Failure

  /** Response envelope (V7): `{logs, count, query: {echoed params}}` —
    * count is the post-limit result size (api.go:110), not a table count. */
  final case class QueryEcho(service: String, from: String, to: String,
      level: Option[String], user: Option[String], limit: Int)
  final case class Envelope(logs: Seq[Row], count: Int, query: QueryEcho)

  /** V6: the reference bounds every query with a 30 s context timeout
    * (internal/api/api.go:95-96). */
  val DefaultTimeoutMs: Long = 30000L

  /** Dedicated daemon pool for query collects. The global ExecutionContext
    * is sized for CPU-bound work: many concurrent timed-out queries would
    * accumulate blocked threads there and starve unrelated users of the
    * shared pool. A cached pool of daemon threads gives every query a
    * thread immediately (so the timeout-before-start race below is already
    * vanishingly rare) and lets blocked collects pile up without touching
    * anyone else's executor. */
  private lazy val queryPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-logs-query")
        t.setDaemon(true)
        t
      }))

  /** Run the flagship query and wrap results in the reference envelope,
    * enforcing the V6 timeout: the collect runs under a dedicated job
    * group; if it exceeds `timeoutMs` the group's Spark jobs are cancelled
    * (tasks interrupted) and the API returns an error — the moral
    * equivalent of Go's `context.WithTimeout` cancelling the ClickHouse
    * query. */
  def query(logs: DataFrame, params: Map[String, String],
      timeoutMs: Long = DefaultTimeoutMs): Either[Failure, Envelope] =
    parseParams(params) match {
      case Left(e) => Left(BadRequest(e))
      case Right(p) =>
        import java.util.concurrent.atomic.AtomicBoolean
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        val sc = logs.sparkSession.sparkContext
        val group = s"graft-logs-query-${java.util.UUID.randomUUID()}"
        // started/timedOut close the cancel-before-start race: if the
        // timeout fires before the worker thread claims the query (pool
        // saturation), cancelJobGroup would precede setJobGroup and the
        // query would later run to completion UNGOVERNED after the API
        // already returned a timeout. With the flags, a not-yet-started
        // query is skipped instead of run, and cancelJobGroup is only
        // issued once the group assignment actually happened.
        val started = new AtomicBoolean(false)
        val timedOut = new AtomicBoolean(false)
        val fut = Future {
          if (timedOut.get() || !started.compareAndSet(false, true)) Seq.empty[Row]
          else {
            // job-group assignment is thread-local: set it on the thread
            // that submits the collect so cancelJobGroup reaches exactly
            // this query
            sc.setJobGroup(group, "logs query (V6 timeout)", interruptOnCancel = true)
            try {
              if (timedOut.get()) Seq.empty[Row] // cancelled between claim and submit
              else LogQuery.flagship(logs, p).collect().toSeq
            } finally sc.clearJobGroup()
          }
        }(queryPool)
        try {
          val rows = Await.result(fut, timeoutMs.millis)
          Right(Envelope(rows, rows.length,
            QueryEcho(p.service, p.from.toInstant.toString, p.to.toInstant.toString,
              p.level, p.user, p.limit)))
        } catch {
          case _: java.util.concurrent.TimeoutException =>
            timedOut.set(true)
            if (started.get()) sc.cancelJobGroup(group)
            Left(ServerError(s"query timed out after ${timeoutMs} ms"))
        }
    }
}
