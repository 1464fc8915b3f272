package graft.logs

import java.util.concurrent.{ConcurrentLinkedQueue, TimeUnit}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import GrpcTestClient.{call, connect, requestHeaders}

/** Transport-level proof of the gRPC listener: a netty HTTP/2 CLIENT
  * ([[GrpcTestClient]] — the independent half of the codec the server
  * sits on; connection preface, SETTINGS exchange, HPACK, flow control
  * all exercised for real over a loopback socket) calls
  * `/logs.v1.LogService/BatchWrite` and the full gRPC grammar is
  * asserted: response HEADERS, one length-prefixed `BatchWriteResponse`
  * DATA frame, trailers with `grpc-status`, ack = accepted count
  * (service.go:41-46).
  *
  * The >64 KiB batch case is the flow-control proof: the HTTP/2 default
  * stream window is 65535 bytes, so the client can only finish writing
  * if the server replenishes consumed bytes with WINDOW_UPDATE frames —
  * a server that drops them deadlocks that test, it cannot pass slowly.
  */
class GrpcServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  // ── server under test: sink records entries, acks the count ──
  private val received = new ConcurrentLinkedQueue[Seq[LogEntryMsg]]()
  @volatile private var failSink = false
  private val server = new GrpcServer(entries => {
    if (failSink) sys.error("sink down")
    received.add(entries)
    entries.size.toLong
  }).start()

  private val group = GrpcTestClient.group()

  override def afterAll(): Unit = {
    server.stop()
    group.shutdownGracefully(0, 1, TimeUnit.SECONDS).sync()
  }

  private def entry(i: Int, msg: String = "ok"): LogEntryMsg = LogEntryMsg(
    ts = f"2024-01-10T12:00:${i % 60}%02dZ", service = s"svc$i",
    level = "INFO", msg = msg, attrs = Map("k" -> s"v$i"),
    trace_id = s"tr$i", span_id = s"sp$i")

  private def framedRequest(entries: Seq[LogEntryMsg]): Array[Byte] =
    LogProto.frame(LogProto.encodeBatchWriteRequest(entries))

  test("unary BatchWrite: 200 + response message + grpc-status 0; ack = count") {
    received.clear()
    val conn = connect(group, server.port)
    try {
      val entries = (1 to 5).map(entry(_))
      val r = call(conn, requestHeaders(server.port), framedRequest(entries))
      assert(r.headers.status().toString == "200")
      assert(r.headers.get("content-type").toString.startsWith("application/grpc"))
      assert(r.trailers != null && r.trailers.get("grpc-status").toString == "0")
      val written = LogProto.decodeBatchWriteResponse(
        LogProto.unframe(r.bodyBytes))
      assert(written == 5L)
      assert(received.poll() == entries) // field-level fidelity through the wire
    } finally conn.close().sync()
  }

  test("flow control: a >64KiB batch crosses the default 65535-byte window") {
    received.clear()
    val big = "x" * 2048
    val entries = (1 to 64).map(entry(_, msg = big)) // ~130 KiB framed
    val payload = framedRequest(entries)
    assert(payload.length > 2 * 65535, "test payload must exceed the window")
    val conn = connect(group, server.port)
    try {
      val r = call(conn, requestHeaders(server.port), payload)
      assert(r.trailers.get("grpc-status").toString == "0")
      assert(LogProto.decodeBatchWriteResponse(
        LogProto.unframe(r.bodyBytes)) == 64L)
      assert(received.poll() == entries)
    } finally conn.close().sync()
  }

  test("two interleaved streams on one connection answer independently") {
    received.clear()
    val conn = connect(group, server.port)
    try {
      val n1 = GrpcTestClient.batchWrite(conn, server.port, Seq(entry(1)))
      val n2 = GrpcTestClient.batchWrite(conn, server.port, (1 to 3).map(entry(_)))
      assert(Set(n1, n2) == Set(1L, 3L))
    } finally conn.close().sync()
  }

  test("unknown method: trailers-only grpc-status 12 (UNIMPLEMENTED)") {
    val conn = connect(group, server.port)
    try {
      val r = call(conn,
        requestHeaders(server.port, path = "/logs.v1.LogService/Nope"),
        framedRequest(Seq(entry(1))))
      assert(r.headers.get("grpc-status").toString == "12")
      assert(r.body.readableBytes() == 0)
    } finally conn.close().sync()
  }

  test("non-POST is rejected with HTTP 405 before gRPC semantics") {
    val conn = connect(group, server.port)
    try {
      val r = call(conn, requestHeaders(server.port, method = "GET"),
        Array.empty, endAfterHeaders = true)
      assert(r.headers.status().toString == "405")
    } finally conn.close().sync()
  }

  test("non-gRPC content type is rejected with HTTP 415") {
    val conn = connect(group, server.port)
    try {
      val r = call(conn,
        requestHeaders(server.port, contentType = "application/json"),
        framedRequest(Seq(entry(1))))
      assert(r.headers.status().toString == "415")
    } finally conn.close().sync()
  }

  test("malformed message bytes: grpc-status 13 (INTERNAL), like grpc-go unmarshal") {
    val conn = connect(group, server.port)
    try {
      val junk = LogProto.frame(Array[Byte](0x0A, 0x7f, 1, 2)) // truncated
      val r = call(conn, requestHeaders(server.port), junk)
      assert(r.headers.get("grpc-status").toString == "13")
    } finally conn.close().sync()
  }

  test("sink failure surfaces as grpc-status 13, not a connection teardown") {
    val conn = connect(group, server.port)
    try {
      failSink = true
      val r = call(conn, requestHeaders(server.port),
        framedRequest(Seq(entry(1))))
      assert(r.headers.get("grpc-status").toString == "13")
      failSink = false
      // the connection survives: a follow-up call on the SAME conn succeeds
      assert(GrpcTestClient.batchWrite(conn, server.port, Seq(entry(2))) == 1L)
    } finally { failSink = false; conn.close().sync() }
  }

  test("grpc-message percent-encoding: space passes, % and controls encode") {
    assert(GrpcServer.grpcPercentEncode("ok then") == "ok then")
    assert(GrpcServer.grpcPercentEncode("50%") == "50%25")
    assert(GrpcServer.grpcPercentEncode("a\nb") == "a%0Ab")
  }

  test("inbound cap: an over-limit request answers RESOURCE_EXHAUSTED (8)") {
    // tiny cap so the reject happens mid-stream; the connection (and its
    // shared flow-control window) must survive for a follow-up call
    val small = new GrpcServer(es => es.size.toLong,
      maxMessageBytes = 16 * 1024).start()
    val tap = new GrpcTestClient.ResetTap
    val conn = connect(group, small.port, tap)
    try {
      val over = framedRequest((1 to 32).map(entry(_, msg = "y" * 2048)))
      assert(over.length > 16 * 1024)
      val r = call(conn, requestHeaders(small.port), over)
      assert(r.headers.get("grpc-status").toString == "8")
      // the reject must also RESET the stream: half-closing only the
      // server side leaves the client free to stream unbounded bytes
      assert(tap.seen.await(5, TimeUnit.SECONDS),
        "no RST_STREAM reached the client after the over-cap reject")
      val ok = call(conn, requestHeaders(small.port),
        framedRequest(Seq(entry(1))))
      assert(ok.trailers.get("grpc-status").toString == "0")
    } finally { conn.close().sync(); small.stop() }
  }

  test("grpc-timeout: expiry during a slow sink maps to DEADLINE_EXCEEDED (4)") {
    // sink stalls 400 ms; client deadline 50 ms — grpc-go's post-handler
    // ctx.Err() check: the late result must NOT become a late OK
    val slow = new GrpcServer(es => { Thread.sleep(400); es.size.toLong }).start()
    val conn = connect(group, slow.port)
    try {
      val h = requestHeaders(slow.port)
      h.set("grpc-timeout", "50m")
      val r = call(conn, h, framedRequest(Seq(entry(1))))
      assert(r.headers.get("grpc-status").toString == "4",
        s"want DEADLINE_EXCEEDED, got headers=${r.headers} trailers=${r.trailers}")
    } finally { conn.close().sync(); slow.stop() }
  }

  test("grpc-timeout: a stalled REQUEST is answered 4 at expiry and reset") {
    val tap = new GrpcTestClient.ResetTap
    val conn = connect(group, server.port, tap)
    try {
      val h = requestHeaders(server.port)
      h.set("grpc-timeout", "100m")
      // headers + partial body, never END_STREAM: only the server's own
      // deadline timer can answer this stream
      val r = GrpcTestClient.callStalled(conn, h,
        framedRequest(Seq(entry(1))).take(3))
      assert(r.headers.get("grpc-status").toString == "4")
      assert(tap.seen.await(5, TimeUnit.SECONDS),
        "no RST_STREAM after the deadline answered a stalled request")
      // connection survives for a normal follow-up
      assert(GrpcTestClient.batchWrite(conn, server.port, Seq(entry(9))) == 1L)
    } finally conn.close().sync()
  }

  test("grpc-timeout: a generous deadline changes nothing (status 0)") {
    val conn = connect(group, server.port)
    try {
      val h = requestHeaders(server.port)
      h.set("grpc-timeout", "10S")
      val r = call(conn, h, framedRequest(Seq(entry(3))))
      assert(r.trailers != null && r.trailers.get("grpc-status").toString == "0")
    } finally conn.close().sync()
  }

  test("grpc-encoding gzip: a compressed BatchWrite is accepted end-to-end") {
    received.clear()
    val conn = connect(group, server.port)
    try {
      val entries = (1 to 7).map(entry(_))
      val h = requestHeaders(server.port)
      h.set("grpc-encoding", "gzip")
      val r = call(conn, h,
        LogProto.frameGzipped(LogProto.encodeBatchWriteRequest(entries)))
      assert(r.trailers != null && r.trailers.get("grpc-status").toString == "0",
        s"headers=${r.headers} trailers=${r.trailers}")
      assert(LogProto.decodeBatchWriteResponse(
        LogProto.unframe(r.bodyBytes)) == 7L)
      assert(received.poll() == entries) // decoded fidelity through gzip
      assert(r.headers.get("grpc-accept-encoding") != null &&
        r.headers.get("grpc-accept-encoding").toString.contains("gzip"))
    } finally conn.close().sync()
  }

  test("grpc-encoding gzip: the compressed flag is per-message — flag 0 passes") {
    // a gzip-negotiated client may still send individual messages
    // uncompressed (flag byte 0); the spec makes the flag authoritative
    val conn = connect(group, server.port)
    try {
      val h = requestHeaders(server.port)
      h.set("grpc-encoding", "gzip")
      val r = call(conn, h, framedRequest(Seq(entry(1), entry(2))))
      assert(r.trailers != null && r.trailers.get("grpc-status").toString == "0")
      assert(LogProto.decodeBatchWriteResponse(
        LogProto.unframe(r.bodyBytes)) == 2L)
    } finally conn.close().sync()
  }

  test("unsupported grpc-encoding: UNIMPLEMENTED (12) + accept-encoding + reset") {
    val tap = new GrpcTestClient.ResetTap
    val conn = connect(group, server.port, tap)
    try {
      val h = requestHeaders(server.port)
      h.set("grpc-encoding", "snappy")
      val r = GrpcTestClient.callStalled(conn, h) // server answers at HEADERS
      assert(r.headers.get("grpc-status").toString == "12")
      assert(r.headers.get("grpc-accept-encoding").toString == "identity,gzip")
      assert(tap.seen.await(5, TimeUnit.SECONDS),
        "no RST_STREAM after the unsupported-coding reject")
      // connection survives for a normal follow-up
      assert(GrpcTestClient.batchWrite(conn, server.port, Seq(entry(8))) == 1L)
    } finally conn.close().sync()
  }

  test("compressed flag without negotiated encoding: INTERNAL (13)") {
    val conn = connect(group, server.port)
    try { // flag byte 1 but no grpc-encoding header → identity stream
      val r = call(conn, requestHeaders(server.port),
        LogProto.frameGzipped(LogProto.encodeBatchWriteRequest(Seq(entry(1)))))
      assert(r.headers.get("grpc-status").toString == "13")
    } finally conn.close().sync()
  }

  test("gzip bomb: the receive cap applies to DECODED bytes → 8") {
    // 1 MiB of a single repeated byte gzips to ~1 KiB — under a 64 KiB
    // wire cap, far over it decoded; the reject must be RESOURCE_EXHAUSTED
    val small = new GrpcServer(es => es.size.toLong,
      maxMessageBytes = 64 * 1024).start()
    val conn = connect(group, small.port)
    try {
      val bomb = LogProto.encodeBatchWriteRequest(
        Seq(entry(1, msg = "z" * (1024 * 1024))))
      val framed = LogProto.frameGzipped(bomb)
      assert(framed.length < 64 * 1024, "wire bytes must slip under the cap")
      val h = requestHeaders(small.port)
      h.set("grpc-encoding", "gzip")
      val r = call(conn, h, framed)
      assert(r.headers.get("grpc-status").toString == "8",
        s"want RESOURCE_EXHAUSTED, got ${r.headers}")
    } finally { conn.close().sync(); small.stop() }
  }

  test("grpc-timeout parse: spec units, bounds, and lenient rejection") {
    import GrpcServer.parseGrpcTimeoutNanos
    assert(parseGrpcTimeoutNanos("50m").contains(50L * 1000000L))
    assert(parseGrpcTimeoutNanos("1H").contains(3600L * 1000000000L))
    assert(parseGrpcTimeoutNanos("7n").contains(7L))
    assert(parseGrpcTimeoutNanos("99999999S").isDefined) // 8 digits max
    assert(parseGrpcTimeoutNanos("999999999S").isEmpty)  // 9 digits
    assert(parseGrpcTimeoutNanos("").isEmpty)
    assert(parseGrpcTimeoutNanos("S").isEmpty)
    assert(parseGrpcTimeoutNanos("5x").isEmpty)
    assert(parseGrpcTimeoutNanos("-5S").isEmpty)
    assert(parseGrpcTimeoutNanos(null).isEmpty)
  }
}
