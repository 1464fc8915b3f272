package graft.logs

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** End-to-end V1/V8 transport behaviors over a live loopback server:
  * GET-only 405 on /v1/logs (internal/api/api.go:32-36), /live + /ready
  * (cmd/server/main.go:58-59), /api/ping pong (api.go:23-26), 400s from
  * the V2-V5 validation stack, and the {logs, count, query} envelope. */
class LogHttpServerSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = SparkTestBase.spark

  private def t(s: String) = Timestamp.from(java.time.Instant.parse(s))

  private lazy val logs = {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Row(t("2024-01-10T00:00:00Z"), "api", "INFO", "hello \"world\"", """{"user":"jane"}""", "tr1", "sp1"),
      Row(t("2024-01-11T00:00:00Z"), "api", "ERROR", "boom", "{}", "tr2", "sp2"),
      Row(t("2024-01-12T00:00:00Z"), "web", "INFO", "other", "{}", "tr3", "sp3"))
    spark.createDataFrame(rows.asJava, LogSchema.schema)
  }

  private var server: LogHttpServer = _
  private lazy val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    server = new LogHttpServer(logs).start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  private def get(path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())

  test("V8: /live and /ready answer 200; /api/ping answers pong") {
    assert(get("/live").statusCode() == 200)
    assert(get("/ready").statusCode() == 200)
    val ping = get("/api/ping")
    assert(ping.statusCode() == 200 && ping.body() == "pong")
  }

  test("V1: non-GET on /v1/logs is 405 Method not allowed") {
    val r = post("/v1/logs?service=api")
    assert(r.statusCode() == 405)
    assert(r.body().startsWith("Method not allowed"))
  }

  test("V2-V5 over the wire: validation failures map to 400 with the reason") {
    assert(get("/v1/logs").statusCode() == 400) // missing service
    val badFrom = get("/v1/logs?service=api&from=yesterday")
    assert(badFrom.statusCode() == 400 && badFrom.body().contains("RFC3339"))
    assert(get("/v1/logs?service=api&limit=0").statusCode() == 400)
    assert(get("/v1/logs?service=api&limit=nope").statusCode() == 400)
    assert(get("/v1/logs?service=api&from=2024-03-01T00:00:00Z&to=2024-01-01T00:00:00Z")
      .statusCode() == 400)
  }

  test("V7 over the wire: envelope carries logs desc by ts, count, echoed query") {
    val r = get("/v1/logs?service=api&from=2024-01-01T00:00:00Z&to=2024-02-01T00:00:00Z")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").orElse("") == "application/json")
    val body = r.body()
    assert(body.contains(""""count":2"""))
    // ts DESC: the ERROR row (Jan 11) precedes the INFO row (Jan 10)
    val i11 = body.indexOf("2024-01-11T00:00:00Z")
    val i10 = body.indexOf("2024-01-10T00:00:00Z")
    assert(i11 >= 0 && i10 >= 0 && i11 < i10)
    // embedded quotes in msg survive the JSON escaping
    assert(body.contains("""hello \"world\""""))
    // attrs rides as the serialized JSON string the storage schema holds
    assert(body.contains("""{\"user\":\"jane\"}"""))
    assert(body.contains(""""service":"api""""))
    assert(body.contains(""""limit":100"""))
    // the web-service row is filtered out
    assert(!body.contains("2024-01-12T00:00:00Z"))
  }

  test("V1+F3: level filter narrows over the wire; limit caps") {
    val r = get("/v1/logs?service=api&level=ERROR&from=2024-01-01T00:00:00Z&to=2024-02-01T00:00:00Z")
    assert(r.statusCode() == 200 && r.body().contains(""""count":1"""))
    val lim = get("/v1/logs?service=api&limit=1&from=2024-01-01T00:00:00Z&to=2024-02-01T00:00:00Z")
    assert(lim.statusCode() == 200 && lim.body().contains(""""count":1"""))
    // newest-first under the cap: Jan 11 wins
    assert(lim.body().contains("2024-01-11T00:00:00Z"))
  }

  test("unknown path answers 404 like the Go mux") {
    assert(get("/nope").statusCode() == 404)
  }

  test("malformed percent-encoding is a CLIENT error (400), never a 500") {
    // %zz is an invalid escape. Go's url.ParseQuery would drop the pair;
    // the JDK HttpServer rejects the request line itself with 400 before
    // the handler runs — still a client-error surface, never an
    // internal-error 500 (the handler's own decode is lenient as
    // defense-in-depth for exchanges that do arrive). Sent over a raw
    // socket: the JDK HttpClient rejects the URI client-side.
    val sock = new java.net.Socket("127.0.0.1", server.port)
    try {
      val out = sock.getOutputStream
      out.write(("GET /v1/logs?service=api&user=%zz&from=2024-01-01T00:00:00Z&to=2024-02-01T00:00:00Z HTTP/1.1\r\n" +
        s"Host: 127.0.0.1:${server.port}\r\nConnection: close\r\n\r\n").getBytes("US-ASCII"))
      out.flush()
      val status = new String(sock.getInputStream.readAllBytes(), "UTF-8").linesIterator.next()
      assert(status.contains("400"), s"got: $status")
      assert(!status.contains("500"), s"got: $status")
    } finally sock.close()
  }

  test("V6 over the wire: a slow query answers 500 Internal server error") {
    import org.apache.spark.sql.functions._
    val t0 = t("2024-01-10T00:00:00Z")
    val slowUdf = udf { (ts: java.sql.Timestamp) => Thread.sleep(1000L); ts }
    val slow = spark.range(60).select(
      slowUdf(lit(t0)).as("ts"),
      lit("api").as("service"), lit("INFO").as("level"), lit("m").as("msg"),
      lit("{}").as("attrs"), lit("").as("trace_id"), lit("").as("span_id"))
    val srv = new LogHttpServer(() => slow, 0, timeoutMs = 1500L).start()
    try {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${srv.port}/v1/logs?service=api&from=2024-01-01T00:00:00Z&to=2024-02-01T00:00:00Z")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      // Go maps the DB context deadline to http.Error 500 (api.go:99-103)
      assert(r.statusCode() == 500)
      assert(r.body().startsWith("Internal server error"))
    } finally srv.stop()
  }

  test("BatchWrite over HTTP: protobuf in, ack out, rows land via the batcher") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.LogStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("bw_table").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bw_ckpt").toString
    val mem = MemoryStream[LogEntryMsg]
    val q = LogStream.ingest(mem.toDF(), table, ckpt)
    val srv = new LogHttpServer(() => LogTable.read(spark, table), 0,
      LogApi.DefaultTimeoutMs,
      batchWriteSink = Some(es => LogStream.batchWrite(mem, es).written)).start()
    try {
      val req = LogProto.encodeBatchWriteRequest(Seq(
        LogEntryMsg("2024-01-10T12:00:00Z", "orders", "INFO", "placed",
          Map("user" -> "jane"), "tr1", "sp1"),
        LogEntryMsg("2024-01-10T12:00:01Z", "orders", "ERROR", "failed",
          Map("user" -> "jane"), "tr2", "sp2")))
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}/v1/batchwrite"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(req)).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("") == "application/x-protobuf")
      // ack = ACCEPTED count (service.go:45-46), issued before any flush
      assert(LogProto.decodeBatchWriteResponse(r.body()) == 2L)
      q.processAllAvailable() // the batcher's flush
      val logs = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${srv.port}/v1/logs?service=orders&from=2024-01-01T00:00:00Z&to=2024-02-01T00:00:00Z")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(logs.statusCode() == 200 && logs.body().contains(""""count":2"""))

      // gRPC length-prefixed framing in → same framing out
      val framed = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}/v1/batchwrite"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(LogProto.frame(req))).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(framed.statusCode() == 200)
      assert(framed.headers().firstValue("Content-Type").orElse("") == "application/grpc+proto")
      assert(LogProto.decodeBatchWriteResponse(LogProto.unframe(framed.body())) == 2L)

      // malformed body → 400, GET → 405
      val bad = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}/v1/batchwrite"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(Array(0x0A.toByte))).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 400 && bad.body().contains("malformed"))
      val wrongMethod = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}/v1/batchwrite"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(wrongMethod.statusCode() == 405)
    } finally { srv.stop(); q.stop() }
  }

  test("read-only server (no sink) 404s /v1/batchwrite like the Go mux") {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}/v1/batchwrite"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(Array[Byte]())).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 404)
  }

  test("provider server sees rows appended AFTER startup (live-table freshness)") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("httpfresh").toString
    def batch(ts: String, msg: String) = spark.createDataFrame(
      Seq(Row(t(ts), "api", "INFO", msg, "{}", "", "")).asJava, LogSchema.schema)
    LogTable.append(batch("2024-01-10T00:00:00Z", "first"), dir)
    val srv = new LogHttpServer(() => LogTable.read(spark, dir), 0,
      LogApi.DefaultTimeoutMs).start()
    try {
      def count(): String = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${srv.port}/v1/logs?service=api&from=2024-01-01T00:00:00Z&to=2024-02-01T00:00:00Z")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()
      assert(count().contains(""""count":1"""))
      // a micro-batch lands while the server is up — the next request
      // must re-plan the table read and see it (the reference's
      // DB-mediated freshness; a pinned DataFrame would answer 1 forever)
      LogTable.append(batch("2024-01-11T00:00:00Z", "second"), dir)
      assert(count().contains(""""count":2"""))
    } finally srv.stop()
  }

  test("service loop over gRPC: BatchWrite on the wire → batcher → HTTP query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.LogStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("grpc_table").toString
    val ckpt = java.nio.file.Files.createTempDirectory("grpc_ckpt").toString
    val mem = MemoryStream[LogEntryMsg]
    val q = LogStream.ingest(mem.toDF(), table, ckpt)
    val sink: Seq[LogEntryMsg] => Long =
      es => LogStream.batchWrite(mem, es).written
    val grpc = new GrpcServer(sink).start()
    val http = new LogHttpServer(() => LogTable.read(spark, table), 0,
      LogApi.DefaultTimeoutMs).start()
    val group = GrpcTestClient.group()
    try {
      val conn = GrpcTestClient.connect(group, grpc.port)
      val written = GrpcTestClient.batchWrite(conn, grpc.port, Seq(
        LogEntryMsg("2024-01-10T12:00:00Z", "checkout", "INFO", "paid",
          Map("user" -> "jo"), "tr1", "sp1"),
        LogEntryMsg("2024-01-10T12:00:01Z", "checkout", "ERROR", "retry",
          Map.empty, "tr2", "sp2")))
      conn.close().sync()
      assert(written == 2L) // ack = accepted count, before any flush
      q.processAllAvailable() // the batcher's flush
      val r = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${http.port}/v1/logs?service=checkout" +
            "&from=2024-01-01T00:00:00Z&to=2024-02-01T00:00:00Z")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200 && r.body().contains(""""count":2"""))
      assert(r.body().contains("paid") && r.body().contains("retry"))
    } finally {
      group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS).sync()
      grpc.stop(); http.stop(); q.stop()
    }
  }
}
