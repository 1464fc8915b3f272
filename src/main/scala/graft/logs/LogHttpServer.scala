package graft.logs

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, Row}

/** The reference service's HTTP transport — V1 (GET-only 405 routing,
  * internal/api/api.go:32-36) and V8 (health endpoints,
  * cmd/server/main.go:58-59; /api/ping, internal/api/api.go:23-26) — on
  * the JDK's built-in `com.sun.net.httpserver` (zero dependencies), over
  * the validation/query/timeout stack [[LogApi]] already proves (V2-V7).
  *
  * Routes, mirroring `RegisterRoutes` + the main.go mux:
  *
  *  - `GET /v1/logs?service=...&from=...&to=...[&level=&user=&limit=]` →
  *    200 with the `{logs, count, query}` envelope (api.go:108-119);
  *    any other method → 405 "Method not allowed" (api.go:32-36); any
  *    validation failure → 400 with the failure text (api.go:41-89).
  *  - `/live`, `/ready` → 200 empty (main.go:58-59 answers all methods).
  *  - `/api/ping` → 200 "pong" (api.go:23-26).
  *  - `POST /v1/batchwrite` (when a `batchWriteSink` is wired): the
  *    `LogService.BatchWrite` rpc (proto/log.proto:16-21) with the
  *    protobuf payload HTTP-framed — raw message bytes or a gRPC
  *    length-prefixed frame, answered in kind ([[LogProto]]).
  *  - anything else → 404.
  *
  * Error responses are `text/plain; charset=utf-8` with a trailing
  * newline — the shape Go's `http.Error` emits; the envelope is
  * `application/json`. The server binds loopback on an OS-assigned port
  * by default (tests query [[port]] after [[start]]); `bindHost` takes
  * the configured address the way main.go reads HTTP_ADDR
  * ([[LogServiceMain]] wires the env var through).
  *
  * Queries run against `logsProvider()`, re-invoked PER REQUEST — the
  * reference queries the live table, not a startup snapshot, and a
  * parquet DataFrame pins its file listing at creation, so a service
  * fronting a streaming-ingested [[LogTable]] must re-plan to see new
  * micro-batches (a fixed frame is fine for tests; the single-arg
  * constructor wraps one). The server holds no other state, so
  * concurrent exchanges are safe: each request runs an independent
  * Spark action under [[LogApi.query]]'s per-query job group and V6
  * timeout.
  */
final class LogHttpServer(logsProvider: () => DataFrame, bindPort: Int,
    timeoutMs: Long, bindHost: String = "127.0.0.1",
    batchWriteSink: Option[Seq[LogEntryMsg] => Long] = None) {

  /** Fixed-frame convenience (tests, notebooks): loopback, OS-assigned
    * port, default timeout. */
  def this(logs: DataFrame) = this(() => logs, 0, LogApi.DefaultTimeoutMs)

  private val server = HttpServer.create(new InetSocketAddress(bindHost, bindPort), 0)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-logs-http")
    t.setDaemon(true)
    t
  }))

  server.createContext("/live", (x: HttpExchange) => respond(x, 200, "", "text/plain; charset=utf-8"))
  server.createContext("/ready", (x: HttpExchange) => respond(x, 200, "", "text/plain; charset=utf-8"))
  server.createContext("/api/ping", (x: HttpExchange) => respond(x, 200, "pong", "text/plain; charset=utf-8"))
  server.createContext("/v1/logs", (x: HttpExchange) => handleLogs(x))
  // write path (proto/log.proto:16-21 BatchWrite): mounted only when an
  // ingest sink exists — a read-only server 404s it like the Go mux would
  batchWriteSink.foreach { sink =>
    server.createContext("/v1/batchwrite", (x: HttpExchange) => handleBatchWrite(x, sink))
  }
  // the Go ServeMux would 404 unregistered paths; the JDK server needs a
  // root context to do the same instead of refusing the connection
  server.createContext("/", (x: HttpExchange) => respond(x, 404, "404 page not found\n", "text/plain; charset=utf-8"))

  /** Bound port (useful with bindPort = 0). */
  def port: Int = server.getAddress.getPort

  def start(): LogHttpServer = { server.start(); this }

  def stop(): Unit = server.stop(0)

  private def handleLogs(x: HttpExchange): Unit =
    try {
      if (x.getRequestMethod != "GET")
        respond(x, 405, "Method not allowed\n", "text/plain; charset=utf-8")
      else LogApi.query(logsProvider(), queryParams(x), timeoutMs) match {
        case Left(LogApi.BadRequest(err)) =>
          respond(x, 400, err + "\n", "text/plain; charset=utf-8")
        case Left(e: LogApi.ServerError) =>
          // the reference logs the query failure and answers a generic
          // 500 (api.go:99-103) — incl. the V6 context deadline
          System.err.println(s"[log-http] query failed: ${e.message}")
          respond(x, 500, "Internal server error\n", "text/plain; charset=utf-8")
        case Right(env) => respond(x, 200, envelopeJson(env), "application/json")
      }
    } catch {
      case e: Throwable => serverError(x, "/v1/logs", e)
    }

  /** `BatchWrite` over HTTP: POST body = `BatchWriteRequest` bytes, either
    * raw protobuf or gRPC-length-prefixed ([[LogProto.looksFramed]] — the
    * two are unambiguous byte-wise); response = `BatchWriteResponse` in
    * the SAME framing the caller used. The ack is the ACCEPTED count, not
    * a durability receipt (service.go:45-46): the sink hands entries to
    * the micro-batcher and returns immediately. */
  private def handleBatchWrite(x: HttpExchange, sink: Seq[LogEntryMsg] => Long): Unit =
    try {
      if (x.getRequestMethod != "POST")
        respond(x, 405, "Method not allowed\n", "text/plain; charset=utf-8")
      else {
        val body = x.getRequestBody.readAllBytes()
        val framed = LogProto.looksFramed(body)
        val decoded =
          try Right(LogProto.decodeBatchWriteRequest(
            if (framed) LogProto.unframe(body) else body))
          catch { case e: LogProto.MalformedProto => Left(e.getMessage) }
        decoded match {
          case Left(err) =>
            respond(x, 400, s"malformed BatchWriteRequest: $err\n",
              "text/plain; charset=utf-8")
          case Right(entries) =>
            val written = sink(entries)
            val msg = LogProto.encodeBatchWriteResponse(written)
            respondBytes(x, 200, if (framed) LogProto.frame(msg) else msg,
              if (framed) "application/grpc+proto" else "application/x-protobuf")
        }
      }
    } catch {
      case e: Throwable => serverError(x, "/v1/batchwrite", e)
    }

  /** Log the failure (stderr: the build carries no logging deps) and
    * attempt a 500; if the handler died AFTER response headers were sent, a
    * second sendResponseHeaders would itself throw on the executor thread —
    * fall through to closing the exchange so the connection is released. */
  private def serverError(x: HttpExchange, route: String, e: Throwable): Unit = {
    System.err.println(s"[log-http] $route failed: $e")
    try respond(x, 500, "Internal server error\n", "text/plain; charset=utf-8")
    catch { case _: Throwable => x.close() }
  }

  /** `?a=b&c=d` → Map, URL-decoded; repeated keys keep the FIRST value
    * (Go's `Query().Get`); a pair with malformed percent-encoding is
    * DROPPED, like Go's `url.ParseQuery` recording (and `Query()`
    * discarding) the error for that key — not a 500. */
  private def queryParams(x: HttpExchange): Map[String, String] = {
    val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").iterator.filter(_.nonEmpty).flatMap { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      try Some(java.net.URLDecoder.decode(k, UTF_8) -> java.net.URLDecoder.decode(v, UTF_8))
      catch { case _: IllegalArgumentException => None }
    }.foldLeft(Map.empty[String, String]) { case (m, (k, v)) =>
      if (m.contains(k)) m else m + (k -> v)
    }
  }

  private def respond(x: HttpExchange, status: Int, body: String, ctype: String): Unit =
    respondBytes(x, status, body.getBytes(UTF_8), ctype)

  private def respondBytes(x: HttpExchange, status: Int, bytes: Array[Byte],
      ctype: String): Unit = {
    x.getResponseHeaders.set("Content-Type", ctype)
    x.sendResponseHeaders(status, if (bytes.isEmpty) -1L else bytes.length.toLong)
    if (bytes.nonEmpty) {
      val os = x.getResponseBody
      try os.write(bytes) finally os.close()
    }
    x.close()
  }

  // ── JSON encoding (hand-rolled: no JSON deps in the build) ──

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** One log row → JSON object. Columns are the canonical 7-column
    * projection of [[LogQuery.flagship]]; ts renders RFC3339 UTC like the
    * Go envelope's time.Time marshalling; attrs stays the serialized JSON
    * STRING the storage schema carries (LogSchema.schema — the
    * ClickHouse attrs column is String, so the Go envelope emits it as a
    * quoted string too, not a nested object). */
  private def rowJson(r: Row): String = {
    def s(col: String) = Option(r.getAs[String](col)).getOrElse("")
    val ts = r.getAs[java.sql.Timestamp]("ts").toInstant.toString
    s"""{"ts":${jstr(ts)},"service":${jstr(s("service"))},""" +
      s""""level":${jstr(s("level"))},"msg":${jstr(s("msg"))},""" +
      s""""attrs":${jstr(s("attrs"))},"trace_id":${jstr(s("trace_id"))},""" +
      s""""span_id":${jstr(s("span_id"))}}"""
  }

  private def envelopeJson(env: LogApi.Envelope): String = {
    val q = env.query
    val query =
      s"""{"service":${jstr(q.service)},"level":${jstr(q.level.getOrElse(""))},""" +
        s""""user":${jstr(q.user.getOrElse(""))},"from":${jstr(q.from)},""" +
        s""""to":${jstr(q.to)},"limit":${q.limit}}"""
    s"""{"logs":[${env.logs.map(rowJson).mkString(",")}],"count":${env.count},"query":$query}"""
  }
}
