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

  /** Response envelope (V7): `{logs, count, query: {echoed params}}` —
    * count is the post-limit result size (api.go:110), not a table count. */
  final case class QueryEcho(service: String, from: String, to: String,
      level: Option[String], user: Option[String], limit: Int)
  final case class Envelope(logs: Seq[Row], count: Int, query: QueryEcho)

  /** Run the flagship query and wrap results in the reference envelope. */
  def query(logs: DataFrame, params: Map[String, String]): Either[String, Envelope] =
    parseParams(params).map { p =>
      val rows = LogQuery.flagship(logs, p).collect().toSeq
      Envelope(rows, rows.length,
        QueryEcho(p.service, p.from.toInstant.toString, p.to.toInstant.toString,
          p.level, p.user, p.limit))
    }
}
