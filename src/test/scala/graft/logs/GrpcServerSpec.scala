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
    val conn = connect(group, small.port)
    try {
      val over = framedRequest((1 to 32).map(entry(_, msg = "y" * 2048)))
      assert(over.length > 16 * 1024)
      val r = call(conn, requestHeaders(small.port), over)
      assert(r.headers.get("grpc-status").toString == "8")
      val ok = call(conn, requestHeaders(small.port),
        framedRequest(Seq(entry(1))))
      assert(ok.trailers.get("grpc-status").toString == "0")
    } finally { conn.close().sync(); small.stop() }
  }
}
