package graft.logs

import java.util.concurrent.{CountDownLatch, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.{ByteBuf, Unpooled}
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer,
  ChannelInboundHandlerAdapter, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._

/** Minimal netty HTTP/2 gRPC client for specs: the independent half of
  * the codec [[GrpcServer]] sits on, driving real sockets (preface,
  * SETTINGS, HPACK, flow control). Collects one unary response per
  * [[call]]. Shared by [[GrpcServerSpec]] and the service e2e test. */
object GrpcTestClient {

  /** One collected unary response: headers / body bytes / trailers.
    * A trailers-only reply lands in `headers` with the stream ended. */
  final class Response {
    @volatile var headers: Http2Headers = _
    @volatile var trailers: Http2Headers = _
    val body: ByteBuf = Unpooled.buffer()
    val done = new CountDownLatch(1)
    /** Counts down when the server resets the stream (RST_STREAM). */
    val resetSeen = new CountDownLatch(1)
    def bodyBytes: Array[Byte] = {
      val out = new Array[Byte](body.readableBytes())
      body.getBytes(body.readerIndex(), out)
      out
    }
  }

  private final class CollectHandler(r: Response)
      extends ChannelInboundHandlerAdapter {
    override def channelRead(ctx: ChannelHandlerContext, msg: Object): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          if (r.headers == null) r.headers = h.headers()
          else r.trailers = h.headers()
          if (h.isEndStream) r.done.countDown()
        case d: Http2DataFrame =>
          r.body.writeBytes(d.content())
          ctx.write(new DefaultHttp2WindowUpdateFrame(
            d.initialFlowControlledBytes()))
          d.release()
          ctx.flush()
          if (d.isEndStream) r.done.countDown()
        case _: Http2ResetFrame =>
          r.resetSeen.countDown()
          r.done.countDown()
        case other: Http2Frame => ()
        case other => ctx.fireChannelRead(other)
      }
  }

  def group(): MultiThreadIoEventLoopGroup =
    new MultiThreadIoEventLoopGroup(1, NioIoHandler.newFactory())

  /** Connection-level observer of inbound RST_STREAM frames — tapped
    * BETWEEN the frame codec and the multiplexer, so it sees resets even
    * when the multiplexer answers them by closing the child channel
    * rather than delivering the frame to its pipeline. */
  final class ResetTap {
    val seen = new CountDownLatch(1)
    @volatile var errorCode: Long = -1L
  }

  def connect(group: MultiThreadIoEventLoopGroup, port: Int,
      resetTap: ResetTap = null): Channel = {
    val b = new Bootstrap()
      .group(group)
      .channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          ch.pipeline.addLast(Http2FrameCodecBuilder.forClient().build())
          if (resetTap != null)
            ch.pipeline.addLast(new ChannelInboundHandlerAdapter {
              override def channelRead(ctx: ChannelHandlerContext,
                  msg: Object): Unit = {
                msg match {
                  case r: Http2ResetFrame =>
                    resetTap.errorCode = r.errorCode()
                    resetTap.seen.countDown()
                  case _ => ()
                }
                ctx.fireChannelRead(msg) // transparent tap
              }
            })
          // inbound (server-push) streams don't occur; handler required
          ch.pipeline.addLast(
            new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
        }
      })
    b.connect("127.0.0.1", port).sync().channel()
  }

  def requestHeaders(port: Int, path: String = GrpcServer.BatchWritePath,
      method: String = "POST",
      contentType: String = "application/grpc"): Http2Headers = {
    val h = new DefaultHttp2Headers()
    h.method(method).scheme("http").path(path)
      .authority(s"127.0.0.1:$port")
    h.set("content-type", contentType)
    h.set("te", "trailers")
    h
  }

  /** Open one stream on `conn`, send headers+body, await the response. */
  def call(conn: Channel, headers: Http2Headers, body: Array[Byte],
      endAfterHeaders: Boolean = false): Response = {
    val r = new Response
    val sb = new Http2StreamChannelBootstrap(conn)
      .handler(new ChannelInitializer[Channel] {
        override def initChannel(ch: Channel): Unit =
          ch.pipeline.addLast(new CollectHandler(r))
      })
    val stream = sb.open().sync().getNow
    if (endAfterHeaders) {
      stream.writeAndFlush(new DefaultHttp2HeadersFrame(headers, true))
    } else {
      stream.write(new DefaultHttp2HeadersFrame(headers))
      stream.writeAndFlush(
        new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(body), true))
    }
    require(r.done.await(15, TimeUnit.SECONDS),
      "no end-of-stream from server within 15s")
    r
  }

  /** Open a stream and send only the request HEADERS, returning the
    * stream channel and the response collector — the caller drives the
    * turn structure (bidi methods: write a framed request, poll the
    * collector, write another, END when done). */
  def openStream(conn: Channel, headers: Http2Headers): (Channel, Response) = {
    val r = new Response
    val sb = new Http2StreamChannelBootstrap(conn)
      .handler(new ChannelInitializer[Channel] {
        override def initChannel(ch: Channel): Unit =
          ch.pipeline.addLast(new CollectHandler(r))
      })
    val stream = sb.open().sync().getNow
    stream.writeAndFlush(new DefaultHttp2HeadersFrame(headers))
    (stream, r)
  }

  /** Open a stream and send headers (+ optional body) WITHOUT ever
    * ending the client side — the stalled-request shape the server's
    * grpc-timeout enforcement must answer on its own. */
  def callStalled(conn: Channel, headers: Http2Headers,
      body: Array[Byte] = Array.empty): Response = {
    val r = new Response
    val sb = new Http2StreamChannelBootstrap(conn)
      .handler(new ChannelInitializer[Channel] {
        override def initChannel(ch: Channel): Unit =
          ch.pipeline.addLast(new CollectHandler(r))
      })
    val stream = sb.open().sync().getNow
    if (body.isEmpty) {
      stream.writeAndFlush(new DefaultHttp2HeadersFrame(headers))
    } else {
      stream.write(new DefaultHttp2HeadersFrame(headers))
      stream.writeAndFlush(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(body)))
    }
    require(r.done.await(15, TimeUnit.SECONDS),
      "no response from server within 15s on the stalled stream")
    r
  }

  /** Unary BatchWrite convenience: returns the acked written count. */
  def batchWrite(conn: Channel, port: Int, entries: Seq[LogEntryMsg]): Long = {
    val r = call(conn, requestHeaders(port),
      LogProto.frame(LogProto.encodeBatchWriteRequest(entries)))
    require(r.trailers != null && r.trailers.get("grpc-status").toString == "0",
      s"grpc-status != 0: headers=${r.headers} trailers=${r.trailers}")
    LogProto.decodeBatchWriteResponse(LogProto.unframe(r.bodyBytes))
  }
}
