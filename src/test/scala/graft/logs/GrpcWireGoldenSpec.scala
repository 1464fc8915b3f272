package graft.logs

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Interop proof from FIRST PRINCIPLES: this client shares no code with
  * the server's transport — every byte is laid out by hand from the
  * published specs (HTTP/2 framing RFC 7540 §4-6, HPACK RFC 7541 §6.2.2
  * literal-without-indexing, gRPC PROTOCOL-HTTP2 length-prefixed
  * messages) and written to a plain `java.net.Socket`. If the listener
  * interops with these bytes it interops with any conforming gRPC
  * client, independent of netty's own client codec (which the companion
  * [[GrpcServerSpec]] exercises).
  *
  * Response HEADERS come back HPACK-encoded by the server's encoder;
  * this spec asserts the frame grammar (HEADERS → DATA → HEADERS with
  * END_STREAM — the gRPC unary shape) and decodes the DATA payload,
  * which is all the ack contract needs.
  */
class GrpcWireGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val received =
    new java.util.concurrent.ConcurrentLinkedQueue[Seq[LogEntryMsg]]()
  private val server = new GrpcServer(entries => {
    received.add(entries); entries.size.toLong
  }).start()

  override def afterAll(): Unit = server.stop()

  // ── RFC 7540 §4.1 frame header: 24-bit length, type, flags, 31-bit id ──
  private def frameHeader(len: Int, tpe: Int, flags: Int, sid: Int): Array[Byte] =
    Array(((len >> 16) & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      (len & 0xff).toByte, tpe.toByte, flags.toByte,
      ((sid >> 24) & 0x7f).toByte, ((sid >> 16) & 0xff).toByte,
      ((sid >> 8) & 0xff).toByte, (sid & 0xff).toByte)

  /** RFC 7541 §6.2.2: literal header field without indexing, new name
    * (first byte 0x00), non-huffman (length high bit 0). Header names
    * and values here stay <127 bytes so one-byte lengths suffice. */
  private def hpackLiteral(name: String, value: String): Array[Byte] = {
    val n = name.getBytes(US_ASCII)
    val v = value.getBytes(US_ASCII)
    require(n.length < 127 && v.length < 127)
    Array[Byte](0x00, n.length.toByte) ++ n ++
      Array[Byte](v.length.toByte) ++ v
  }

  private def readFrame(in: DataInputStream): GrpcWireGoldenSpec.Frame = {
    import GrpcWireGoldenSpec.Frame
    val h = new Array[Byte](9)
    in.readFully(h)
    val len = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
    val payload = new Array[Byte](len)
    in.readFully(payload)
    Frame(h(3) & 0xff, h(4) & 0xff,
      ((h(5) & 0x7f) << 24) | ((h(6) & 0xff) << 16) |
        ((h(7) & 0xff) << 8) | (h(8) & 0xff), payload)
  }

  test("hand-built HTTP/2 bytes round-trip a BatchWrite (unary frame grammar)") {
    received.clear()
    val sock = new Socket("127.0.0.1", server.port)
    sock.setSoTimeout(15000)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)

      // connection preface (RFC 7540 §3.5) + empty client SETTINGS
      out.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(US_ASCII))
      out.write(frameHeader(0, 0x4, 0, 0))
      out.flush()

      // HEADERS, stream 1, END_HEADERS(0x4): pseudo-headers first
      val block =
        hpackLiteral(":method", "POST") ++
          hpackLiteral(":scheme", "http") ++
          hpackLiteral(":path", GrpcServer.BatchWritePath) ++
          hpackLiteral(":authority", s"127.0.0.1:${server.port}") ++
          hpackLiteral("content-type", "application/grpc") ++
          hpackLiteral("te", "trailers")
      out.write(frameHeader(block.length, 0x1, 0x4, 1))
      out.write(block)

      // DATA, stream 1, END_STREAM(0x1): gRPC length-prefixed request
      val entries = Seq(
        LogEntryMsg(ts = "2024-01-10T12:00:00Z", service = "wire",
          level = "WARN", msg = "raw bytes", attrs = Map("a" -> "1"),
          trace_id = "t", span_id = "s"),
        LogEntryMsg(ts = "2024-01-10T12:00:01Z", service = "wire"))
      val payload = LogProto.frame(LogProto.encodeBatchWriteRequest(entries))
      out.write(frameHeader(payload.length, 0x0, 0x1, 1))
      out.write(payload)
      out.flush()

      // collect stream-1 frames; ack SETTINGS, ignore connection plumbing
      var headersFrames = 0
      var endStream = false
      val body = new java.io.ByteArrayOutputStream()
      while (!endStream) {
        val f = readFrame(in)
        f.tpe match {
          case 0x4 if (f.flags & 0x1) == 0 => // server SETTINGS → ack
            out.write(frameHeader(0, 0x4, 0x1, 0)); out.flush()
          case 0x1 if f.sid == 1 => // HEADERS (response or trailers)
            headersFrames += 1
            assert((f.flags & 0x4) != 0, "END_HEADERS expected (no CONTINUATION)")
            if ((f.flags & 0x1) != 0) endStream = true
          case 0x0 if f.sid == 1 => // DATA
            body.write(f.payload)
            if ((f.flags & 0x1) != 0) endStream = true
          case _ => () // SETTINGS ack, WINDOW_UPDATE, PING, GOAWAY…
        }
      }

      // gRPC unary grammar: response HEADERS, then trailers HEADERS w/ END_STREAM
      assert(headersFrames == 2,
        s"expected response+trailers HEADERS, saw $headersFrames")
      val written = LogProto.decodeBatchWriteResponse(
        LogProto.unframe(body.toByteArray))
      assert(written == 2L)
      assert(received.poll() == entries)
    } finally sock.close()
  }
}

object GrpcWireGoldenSpec {
  private final case class Frame(tpe: Int, flags: Int, sid: Int,
      payload: Array[Byte])
}
