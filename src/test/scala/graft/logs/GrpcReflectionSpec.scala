package graft.logs

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.TimeUnit

import io.netty.buffer.Unpooled
import io.netty.handler.codec.http2.DefaultHttp2DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import GrpcTestClient.{call, connect, requestHeaders}

/** Live-socket proof of the reflection stub ([[ReflectionProto]]): a
  * stock-shaped client drives `ServerReflectionInfo` the way `grpcurl`
  * does — `list` (list_services) and `describe` (file_containing_symbol)
  * — and the responses are decoded back with an independent mini-parser
  * (field walks written here, not the server's encoders). The bidi case
  * holds ONE stream open across two request turns: a server that only
  * answers at END_STREAM deadlocks it. */
class GrpcReflectionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new GrpcServer(entries => entries.size.toLong).start()
  private val group = GrpcTestClient.group()

  override def afterAll(): Unit = {
    server.stop()
    group.shutdownGracefully(0, 1, TimeUnit.SECONDS).sync()
  }

  // ── independent request encoders / response parser ──

  private def strField(field: Int, s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val b = s.getBytes(UTF_8)
    out.write((field << 3) | 2); out.write(b.length); out.write(b, 0, b.length)
    out.toByteArray
  }

  private def listServicesRequest: Array[Byte] = strField(7, "*")
  private def describeRequest(symbol: String): Array[Byte] = strField(4, symbol)
  private def fileRequest(name: String): Array[Byte] = strField(3, name)

  /** Walk top-level (field → payload) pairs of one message. */
  private def fields(b: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var p = 0
    while (p < b.length) {
      val tag = b(p) & 0xff
      val (field, wire) = (tag >>> 3, tag & 7)
      p += 1
      wire match {
        case 2 =>
          var len = 0; var shift = 0; var more = true
          while (more) {
            val x = b(p) & 0xff; len |= (x & 0x7f) << shift; shift += 7
            p += 1; more = (x & 0x80) != 0
          }
          out += ((field, java.util.Arrays.copyOfRange(b, p, p + len))); p += len
        case 0 =>
          var v = 0L; var shift = 0; var more = true
          val start = p
          while (more) {
            val x = b(p) & 0xff; v |= (x & 0x7fL) << shift; shift += 7
            p += 1; more = (x & 0x80) != 0
          }
          out += ((field, java.util.Arrays.copyOfRange(b, start, p)))
        case w => fail(s"unexpected wire type $w in test parser")
      }
    }
    out.result()
  }

  private def reflectionCall(path: String, request: Array[Byte]): Array[Byte] = {
    val conn = connect(group, server.port)
    try {
      val r = call(conn, requestHeaders(server.port, path = path),
        LogProto.frame(request))
      assert(r.headers.status().toString == "200")
      assert(r.trailers != null && r.trailers.get("grpc-status").toString == "0")
      LogProto.unframe(r.bodyBytes)
    } finally conn.close().sync()
  }

  test("list_services names logs.v1.LogService (v1 path)") {
    val resp = reflectionCall(ReflectionProto.V1Path, listServicesRequest)
    val listResp = fields(resp).collectFirst { case (6, p) => p }.get
    val names = fields(listResp).collect { case (1, svc) =>
      new String(fields(svc).collectFirst { case (1, n) => n }.get, UTF_8)
    }
    assert(names == Seq("logs.v1.LogService"))
    // valid_host + original_request echoes are present
    assert(fields(resp).exists(_._1 == 2))
  }

  test("describe logs.v1.LogService returns the log.proto descriptor") {
    val resp = reflectionCall(ReflectionProto.V1Path,
      describeRequest("logs.v1.LogService"))
    val fdResp = fields(resp).collectFirst { case (4, p) => p }.get
    val fdp = fields(fdResp).collectFirst { case (1, p) => p }.get
    val top = fields(fdp)
    assert(new String(top.collectFirst { case (1, n) => n }.get, UTF_8) == "log.proto")
    assert(new String(top.collectFirst { case (2, n) => n }.get, UTF_8) == "logs.v1")
    val messages = top.collect { case (4, m) =>
      new String(fields(m).collectFirst { case (1, n) => n }.get, UTF_8) }
    assert(messages == Seq("LogEntry", "BatchWriteRequest", "BatchWriteResponse"))
    val service = top.collectFirst { case (6, s) => s }.get
    assert(new String(fields(service).collectFirst { case (1, n) => n }.get, UTF_8)
      == "LogService")
    val method = fields(service).collectFirst { case (2, m) => m }.get
    assert(new String(fields(method).collectFirst { case (1, n) => n }.get, UTF_8)
      == "BatchWrite")
    // the map field compiled to a nested AttrsEntry with map_entry set
    val logEntry = top.collect { case (4, m) => m }.head
    val nested = fields(logEntry).collectFirst { case (3, n) => n }.get
    assert(new String(fields(nested).collectFirst { case (1, n) => n }.get, UTF_8)
      == "AttrsEntry")
  }

  test("v1alpha fallback path serves the same bytes") {
    val v1 = reflectionCall(ReflectionProto.V1Path, fileRequest("log.proto"))
    val v1a = reflectionCall(ReflectionProto.V1AlphaPath, fileRequest("log.proto"))
    assert(java.util.Arrays.equals(v1, v1a))
  }

  test("unknown symbol answers error_response NOT_FOUND (5)") {
    val resp = reflectionCall(ReflectionProto.V1Path,
      describeRequest("nope.v9.Missing"))
    val err = fields(resp).collectFirst { case (7, p) => p }.get
    val code = fields(err).collectFirst { case (1, v) => v }.get
    assert((code(0) & 0x7f) == 5)
  }

  test("bidi turn structure: two requests on ONE open stream each answered") {
    val conn = connect(group, server.port)
    try {
      val (stream, r) = GrpcTestClient.openStream(conn,
        requestHeaders(server.port, path = ReflectionProto.V1Path))
      def awaitBodyAtLeast(n: Int): Unit = {
        val deadline = System.nanoTime() + 10L * 1000000000L
        while (r.body.readableBytes() < n) {
          assert(System.nanoTime() < deadline, "no reflection response in 10s")
          Thread.sleep(10)
        }
      }
      stream.writeAndFlush(new DefaultHttp2DataFrame(
        Unpooled.wrappedBuffer(LogProto.frame(listServicesRequest))))
      awaitBodyAtLeast(5)
      val first = r.body.readableBytes()
      stream.writeAndFlush(new DefaultHttp2DataFrame(
        Unpooled.wrappedBuffer(LogProto.frame(describeRequest("logs.v1.LogEntry")))))
      awaitBodyAtLeast(first + 5) // a SECOND framed response arrived
      stream.writeAndFlush(new DefaultHttp2DataFrame(Unpooled.EMPTY_BUFFER, true))
      assert(r.done.await(10, TimeUnit.SECONDS))
      assert(r.trailers.get("grpc-status").toString == "0")
    } finally conn.close().sync()
  }
}
