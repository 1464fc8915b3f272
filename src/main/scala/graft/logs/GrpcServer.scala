package graft.logs

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.{ByteBuf, Unpooled}
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer,
  ChannelInboundHandlerAdapter, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2._

/** The reference's gRPC listener (`cmd/server/main.go:75-86`:
  * `grpc.NewServer()` + `RegisterLogServiceServer` on `GRPC_ADDR`,
  * default `:8081`), re-expressed on netty's HTTP/2 codec — the same
  * transport layer grpc-netty itself is built on, and the one HTTP/2
  * implementation already on this build's declared classpath
  * (`/opt/spark/jars/netty-codec-http2-*.jar`; the build resolves no
  * grpc artifacts, so the gRPC protocol layer here is hand-implemented
  * against the published gRPC-over-HTTP/2 spec).
  *
  * Wire contract served, end to end:
  *  - HTTP/2 connection management (preface, SETTINGS, HPACK, per-stream
  *    and connection flow control) — netty `Http2FrameCodec`;
  *  - request routing on `:path = /logs.v1.LogService/BatchWrite`
  *    (proto/log.proto:3+19-21: package `logs.v1`, service `LogService`),
  *    plus the server-reflection paths ([[ReflectionProto]] — the
  *    `grpcurl` discovery surface grpc-go's `reflection.Register` gives
  *    the reference at `cmd/server/main.go:78`), answered incrementally
  *    per framed request as the bidi method requires;
  *  - gRPC framing: request DATA carries 1-byte compressed flag + u32-BE
  *    length + protobuf message ([[LogProto.unframe]]);
  *  - message bytes: the hand-rolled proto3 codec
  *    ([[LogProto.decodeBatchWriteRequest]] /
  *    [[LogProto.encodeBatchWriteResponse]]);
  *  - response: HEADERS `:status 200, content-type application/grpc`,
  *    one framed `BatchWriteResponse`, trailers `grpc-status 0` — ack =
  *    accepted count, the reference's fire-and-forget batcher contract
  *    (internal/service/service.go:41-46).
  *
  * Error mapping follows grpc-go's server conventions: non-POST → HTTP
  * 405; non-`application/grpc*` content type → HTTP 415; unknown method →
  * trailers-only `grpc-status 12` (UNIMPLEMENTED); malformed frame or
  * proto bytes → `grpc-status 13` (INTERNAL, the unmarshal-failure code);
  * sink failure → `grpc-status 13`. `grpc-timeout` request headers are
  * ENFORCED server-side like grpc-go: expiry maps to `grpc-status 4`
  * (DEADLINE_EXCEEDED), both when the handler finishes after the
  * deadline (a slow sink never turns into a late OK) and, via an
  * event-loop timer, when the client stalls mid-request. Early rejects
  * (over-cap, deadline, unsupported coding) also send RST_STREAM(CANCEL):
  * a trailers-only answer half-closes ONLY the server side, and without
  * the reset a client could keep streaming unbounded bytes into a dead
  * stream.
  *
  * Message compression follows the spec's negotiation: `grpc-encoding:
  * gzip` requests inflate per-message via the JDK (the compressed-flag
  * byte is honored frame by frame; the 4 MiB receive cap re-applies to
  * the DECODED bytes), any other non-identity coding answers
  * trailers-only UNIMPLEMENTED with `grpc-accept-encoding:
  * identity,gzip` advertised — grpc-go's exact behavior for a coding
  * with no registered decompressor — and every response carries the
  * `grpc-accept-encoding` advertisement.
  *
  * Threading: all frames for a connection arrive on its event-loop
  * thread, so per-stream state needs no locks. The sink (a MemoryStream
  * enqueue in [[LogServiceMain]]) is a fast in-memory hand-off, so it
  * runs inline; a blocking sink would move to an offload executor.
  */
final class GrpcServer(sink: Seq[LogEntryMsg] => Long, bindPort: Int = 0,
    bindHost: String = "127.0.0.1",
    maxMessageBytes: Int = GrpcServer.DefaultMaxMessageBytes) {

  private val group = new MultiThreadIoEventLoopGroup(2, NioIoHandler.newFactory())
  @volatile private var channel: Channel = _

  def start(): GrpcServer = {
    val b = new ServerBootstrap()
      .group(group)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit =
          ch.pipeline.addLast(
            Http2FrameCodecBuilder.forServer().build(),
            new GrpcServer.ConnectionHandler(sink, maxMessageBytes))
      })
    channel = b.bind(bindHost, bindPort).sync().channel()
    this
  }

  def port: Int =
    channel.localAddress.asInstanceOf[java.net.InetSocketAddress].getPort

  def stop(): Unit = {
    if (channel != null) channel.close().sync()
    group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS).sync()
  }
}

object GrpcServer {

  /** Full method path per the gRPC PROTOCOL-HTTP2 spec:
    * `/{package}.{Service}/{Method}` (proto/log.proto:3,19-20). */
  val BatchWritePath = "/logs.v1.LogService/BatchWrite"

  /** grpc's stock server-side inbound cap (grpc-go
    * `defaultServerMaxReceiveMessageSize` = 4 MiB): requests past it
    * answer RESOURCE_EXHAUSTED instead of buffering without bound. */
  val DefaultMaxMessageBytes: Int = 4 * 1024 * 1024

  /** The message codings this server can decode — advertised in
    * `grpc-accept-encoding` (grpc-go stock builds advertise their
    * registered compressors the same way). */
  val AcceptEncoding = "identity,gzip"

  /** Per-stream request accumulation: header routing verdict + body. */
  private final class StreamState {
    var path: String = ""
    var method: String = ""
    var contentType: String = ""
    // negotiated request coding (grpc-encoding header); gates the
    // per-message compressed-flag byte in the framing
    var encoding: String = "identity"
    val body: ByteBuf = Unpooled.buffer()
    var done = false // response sent; drop any further frames
    // reflection streams answer each framed request INCREMENTALLY (the
    // bidi shape grpcurl drives: it awaits responses before half-closing)
    var reflect = false
    var headersSent = false
    // grpc-timeout deadline (absolute System.nanoTime), MaxValue = none
    var deadlineNanos: Long = Long.MaxValue
    // event-loop timer that fires DEADLINE_EXCEEDED if the request is
    // still open at expiry (client stalled mid-request)
    var timer: java.util.concurrent.ScheduledFuture[_] = null
    def cancelTimer(): Unit = if (timer != null) { timer.cancel(false); timer = null }
  }

  /** Parse a `grpc-timeout` header value (PROTOCOL-HTTP2 spec: 1-8 ASCII
    * digits + one unit char of H M S m u n) to nanoseconds; None for
    * absent/malformed values (lenient — an unparseable client header
    * degrades to no deadline rather than a connection error). */
  private[graft] def parseGrpcTimeoutNanos(v: String): Option[Long] = {
    if (v == null || v.length < 2 || v.length > 9) return None
    val digits = v.substring(0, v.length - 1)
    if (!digits.forall(c => c >= '0' && c <= '9')) return None
    val mult = v.charAt(v.length - 1) match {
      case 'H' => 3600L * 1000000000L
      case 'M' => 60L * 1000000000L
      case 'S' => 1000000000L
      case 'm' => 1000000L
      case 'u' => 1000L
      case 'n' => 1L
      case _   => return None
    }
    Some(digits.toLong * mult)
  }

  private final class ConnectionHandler(sink: Seq[LogEntryMsg] => Long,
      maxMessageBytes: Int) extends ChannelInboundHandlerAdapter {

    private val streams =
      new java.util.HashMap[Http2FrameStream, StreamState]()

    override def channelRead(ctx: ChannelHandlerContext, msg: Object): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          val st = state(h.stream())
          if (st.path.isEmpty) { // initial HEADERS (not client trailers)
            st.path = str(h.headers().path())
            st.method = str(h.headers().method())
            st.contentType = str(h.headers().get("content-type"))
            st.reflect = ReflectionProto.isReflectionPath(st.path) &&
              st.method == "POST" &&
              st.contentType.startsWith("application/grpc")
            // grpc-encoding: a client that opted into a message coding we
            // cannot decode gets the spec-mandated UNIMPLEMENTED with our
            // supported codings advertised (PROTOCOL-HTTP2 compression
            // rules; grpc-go answers exactly this) — parsing its frames
            // as raw protobuf would be garbage-in
            val enc = str(h.headers().get("grpc-encoding"))
            if (enc.nonEmpty) st.encoding = enc
            if (st.encoding != "identity" && st.encoding != "gzip") {
              st.done = true
              st.body.clear()
              trailersOnly(ctx, h.stream(), 12, // UNIMPLEMENTED
                s"grpc: Decompressor is not installed for grpc-encoding \"${st.encoding}\"")
              ctx.write(new DefaultHttp2ResetFrame(Http2Error.CANCEL)
                .stream(h.stream()))
              ctx.flush()
            }
            // grpc-timeout: a stock deadline-bearing client's header is
            // ENFORCED server-side, matching grpc-go — the deadline is
            // checked when the handler finishes (a slow sink maps to
            // status 4, not a late OK the client already abandoned), and
            // an event-loop timer answers a stalled REQUEST at expiry
            if (!st.done)
              parseGrpcTimeoutNanos(str(h.headers().get("grpc-timeout")))
                .foreach { t =>
                  st.deadlineNanos = System.nanoTime() + t
                  val stream = h.stream()
                  st.timer = ctx.executor().schedule(new Runnable {
                    override def run(): Unit = if (!st.done) {
                      st.done = true
                      st.body.clear()
                      // on a stream whose response HEADERS already went
                      // out (an in-flight reflection exchange) the error
                      // must be proper TRAILERS — no pseudo-headers; a
                      // second :status-bearing HEADERS is an HTTP/2
                      // protocol error to a strict client
                      errorTrailers(ctx, stream, st, 4, // DEADLINE_EXCEEDED
                        "context deadline exceeded")
                      ctx.write(new DefaultHttp2ResetFrame(Http2Error.CANCEL)
                        .stream(stream))
                      ctx.flush()
                    }
                  }, t, java.util.concurrent.TimeUnit.NANOSECONDS)
                }
          }
          if (h.isEndStream) complete(ctx, h.stream(), st)
        case d: Http2DataFrame =>
          val st = state(d.stream())
          if (!st.done) {
            st.body.writeBytes(d.content())
            if (st.reflect) drainReflection(ctx, d.stream(), st)
            // the stock grpc inbound cap: answer RESOURCE_EXHAUSTED the
            // moment the accumulated request crosses it, release the
            // buffer, and drop the stream's remaining frames (st.done)
            if (st.body.readableBytes() > maxMessageBytes) {
              st.done = true
              st.body.clear()
              st.cancelTimer()
              trailersOnly(ctx, d.stream(), 8, // RESOURCE_EXHAUSTED
                s"grpc: received message larger than max ($maxMessageBytes)")
              // half-closing our side doesn't stop the client's upload:
              // RST_STREAM(CANCEL) does — without it a client can keep
              // streaming unbounded bytes into a stream we already
              // rejected (grpc-go resets after an early error too)
              ctx.write(new DefaultHttp2ResetFrame(Http2Error.CANCEL)
                .stream(d.stream()))
            }
          }
          // replenish flow-control windows for the consumed bytes
          // (stream + connection — Http2FrameCodec.consumeBytes does
          // both), even on a rejected stream: the connection window is
          // shared, and a dropped update would stall OTHER streams
          val consumed = d.initialFlowControlledBytes()
          if (consumed > 0)
            ctx.write(new DefaultHttp2WindowUpdateFrame(consumed).stream(d.stream()))
          val end = d.isEndStream
          d.release()
          if (end) complete(ctx, d.stream(), st)
          else ctx.flush()
        case f: Http2ResetFrame =>
          Option(streams.remove(f.stream())).foreach { st =>
            st.cancelTimer(); st.body.release()
          }
        case other: Http2Frame =>
          // SETTINGS/PING/GOAWAY are handled by the codec before reaching
          // here, but some carry reference-counted payloads (GOAWAY
          // debugData) — dropping without release leaks the buffer
          io.netty.util.ReferenceCountUtil.release(other)
        case other =>
          ctx.fireChannelRead(other)
      }

    private def state(s: Http2FrameStream): StreamState = {
      var st = streams.get(s)
      if (st == null) { st = new StreamState; streams.put(s, st) }
      st
    }

    private def str(cs: CharSequence): String =
      if (cs == null) "" else cs.toString

    private def complete(ctx: ChannelHandlerContext, s: Http2FrameStream,
        st: StreamState): Unit = {
      if (st.done) { // already answered (e.g. over-cap reject): reap state
        Option(streams.remove(s)).foreach { t =>
          t.cancelTimer(); t.body.release()
        }
        ctx.flush()
        return
      }
      st.done = true
      st.cancelTimer()
      try {
        if (st.reflect) {
          // end of the reflection stream: every complete request was
          // already answered from the DATA path; close with OK trailers
          drainReflection(ctx, s, st)
          if (!st.headersSent) responseHeaders(ctx, s, st)
          val trailers = new DefaultHttp2Headers()
          trailers.set("grpc-status", "0")
          ctx.write(new DefaultHttp2HeadersFrame(trailers, true).stream(s))
        } else if (st.method != "POST") {
          httpError(ctx, s, "405") // gRPC is POST-only (grpc-go: 405)
        } else if (!st.contentType.startsWith("application/grpc")) {
          httpError(ctx, s, "415") // not a gRPC request (grpc-go: 415)
        } else if (st.path != BatchWritePath) {
          trailersOnly(ctx, s, 12,
            s"unknown service or method ${st.path}") // UNIMPLEMENTED
        } else {
          val raw = new Array[Byte](st.body.readableBytes())
          st.body.readBytes(raw)
          // unframe honors the compressed-flag byte under the stream's
          // negotiated grpc-encoding (gzip inflates via the JDK; the
          // receive cap re-applies to the DECODED bytes — a 4 MiB cap a
          // gzip bomb slips under on the wire still holds post-inflate)
          val entries = LogProto.decodeBatchWriteRequest(
            LogProto.unframe(raw, st.encoding, maxMessageBytes))
          val written = sink(entries)
          if (System.nanoTime() > st.deadlineNanos) {
            // the deadline expired while the handler ran (slow sink):
            // the client has already abandoned the call — answer
            // DEADLINE_EXCEEDED, not a late OK (grpc-go's post-handler
            // ctx.Err() check)
            errorTrailers(ctx, s, st, 4, "context deadline exceeded")
          } else {
            responseHeaders(ctx, s, st)
            ctx.write(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(
              LogProto.frame(LogProto.encodeBatchWriteResponse(written)))).stream(s))
            val trailers = new DefaultHttp2Headers()
            trailers.set("grpc-status", "0")
            ctx.write(new DefaultHttp2HeadersFrame(trailers, true).stream(s))
          }
        }
      } catch {
        case e: LogProto.MessageTooLarge => // decoded size over the cap
          errorTrailers(ctx, s, st, 8, e.getMessage) // RESOURCE_EXHAUSTED
        case e: Throwable => // malformed framing/proto or sink failure
          errorTrailers(ctx, s, st, 13,
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
      } finally {
        ctx.flush()
        Option(streams.remove(s)).foreach(_.body.release())
      }
    }

    /** The OK response HEADERS (:status 200, grpc content type). */
    private def responseHeaders(ctx: ChannelHandlerContext,
        s: Http2FrameStream, st: StreamState): Unit = {
      st.headersSent = true
      val h = new DefaultHttp2Headers()
      h.status("200")
      h.set("content-type", "application/grpc")
      h.set("grpc-accept-encoding", AcceptEncoding)
      ctx.write(new DefaultHttp2HeadersFrame(h).stream(s))
    }

    /** Answer every COMPLETE gRPC frame accumulated on a reflection
      * stream, leaving partial bytes buffered — the incremental turn
      * structure of the bidi ServerReflectionInfo method (a client may
      * hold the stream open across several queries; answering only at
      * END_STREAM would deadlock grpcurl, which awaits each response). */
    private def drainReflection(ctx: ChannelHandlerContext,
        s: Http2FrameStream, st: StreamState): Unit = {
      var progressed = true
      while (progressed) {
        progressed = false
        if (st.body.readableBytes() >= 5) {
          val flag = st.body.getByte(st.body.readerIndex())
          val len = st.body.getUnsignedInt(st.body.readerIndex() + 1)
          if (st.body.readableBytes() >= 5 + len) {
            st.body.skipBytes(5)
            val raw = new Array[Byte](len.toInt)
            st.body.readBytes(raw)
            st.body.discardReadBytes()
            // the compressed-flag byte is per-MESSAGE: a gzip-negotiated
            // client may still send flag-0 frames, and vice versa is an
            // error decodePayload maps for us
            val msg = LogProto.decodePayload(flag, raw, st.encoding,
              Int.MaxValue)
            if (!st.headersSent) responseHeaders(ctx, s, st)
            ctx.write(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(
              LogProto.frame(ReflectionProto.respond(msg)))).stream(s))
            ctx.flush()
            progressed = true
          }
        }
      }
    }

    /** Trailers-only response (gRPC error shape: single HEADERS frame
      * carrying :status 200 + grpc-status, END_STREAM set). */
    private def trailersOnly(ctx: ChannelHandlerContext, s: Http2FrameStream,
        code: Int, message: String): Unit = {
      val h = new DefaultHttp2Headers()
      h.status("200")
      h.set("content-type", "application/grpc")
      h.set("grpc-accept-encoding", AcceptEncoding)
      h.set("grpc-status", code.toString)
      h.set("grpc-message", grpcPercentEncode(message))
      ctx.write(new DefaultHttp2HeadersFrame(h, true).stream(s))
    }

    /** Error answer that respects where the stream already is: before
      * response HEADERS it is the trailers-only shape; after them it must
      * be pseudo-header-free TRAILERS (END_STREAM set) — a second HEADERS
      * frame carrying :status mid-stream is an HTTP/2 protocol error. */
    private def errorTrailers(ctx: ChannelHandlerContext, s: Http2FrameStream,
        st: StreamState, code: Int, message: String): Unit =
      if (st.headersSent) {
        val t = new DefaultHttp2Headers()
        t.set("grpc-status", code.toString)
        t.set("grpc-message", grpcPercentEncode(message))
        ctx.write(new DefaultHttp2HeadersFrame(t, true).stream(s))
      } else trailersOnly(ctx, s, code, message)

    /** Plain-HTTP rejection before gRPC semantics apply (405/415). */
    private def httpError(ctx: ChannelHandlerContext, s: Http2FrameStream,
        status: String): Unit = {
      val h = new DefaultHttp2Headers()
      h.status(status)
      ctx.write(new DefaultHttp2HeadersFrame(h, true).stream(s))
    }

    override def exceptionCaught(ctx: ChannelHandlerContext,
        cause: Throwable): Unit = {
      System.err.println(s"[grpc] connection error: $cause")
      ctx.close()
    }

    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      streams.values.forEach { st => st.cancelTimer(); st.body.release() }
      streams.clear()
      ctx.fireChannelInactive()
    }
  }

  /** grpc-message is percent-encoded per the gRPC HTTP/2 spec (space and
    * printable ASCII pass through, `%` and non-printables encode). */
  private[logs] def grpcPercentEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = b & 0xff
      if (c >= 0x20 && c <= 0x7e && c != '%') sb.append(c.toChar)
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }
}
