package graft.props

import java.util.concurrent.{ConcurrentLinkedQueue, TimeUnit}

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.logs.{GrpcServer, GrpcTestClient, LogEntryMsg}

/** Wire-path fuzz of the full gRPC stack: random entry batches (unicode,
  * embedded escapes, empty fields, empty batches) travel client HPACK →
  * HTTP/2 frames → loopback socket → server codec → [[LogProto]] decode
  * → sink, and the law is end-to-end field fidelity plus ack = accepted
  * count — [[LogProtoProps]]' roundtrip laws upgraded from byte arrays
  * to a live transport. One server and one connection serve all cases
  * (each case is one unary stream), which also soaks stream-id reuse on
  * a long-lived connection. */
object GrpcWireProps extends Properties("GrpcWire") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val received = new ConcurrentLinkedQueue[Seq[LogEntryMsg]]()
  private lazy val server =
    new GrpcServer(es => { received.add(es); es.size.toLong }).start()
  private lazy val group = GrpcTestClient.group()
  private lazy val conn = GrpcTestClient.connect(group, server.port)

  // valid-UTF-16 strings only (a lone surrogate cannot survive UTF-8)
  private val genStr: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.alphaNumStr.map(_.take(20)),
    Gen.listOfN(8, Gen.oneOf('a', 'ß', '☃', ' ', '"', '\\', '\n', '\u0000'))
      .map(_.mkString))

  private val genEntry: Gen[LogEntryMsg] = for {
    ts <- genStr; service <- genStr; level <- genStr; msg <- genStr
    nAttrs <- Gen.choose(0, 4)
    keys <- Gen.listOfN(nAttrs, Gen.alphaNumStr.map(_.take(8)))
    vals <- Gen.listOfN(nAttrs, genStr)
    tr <- genStr; sp <- genStr
  } yield LogEntryMsg(ts, service, level, msg, keys.zip(vals).toMap, tr, sp)

  property("random batches survive the live wire; ack = accepted count") =
    forAll(Gen.choose(0, 6).flatMap(Gen.listOfN(_, genEntry))) { entries =>
      val written = GrpcTestClient.batchWrite(conn, server.port, entries)
      val got = received.poll()
      written == entries.size.toLong && got == entries
    }

  property("gzip-encoded batches survive the live wire; ack = accepted count") =
    forAll(Gen.choose(0, 6).flatMap(Gen.listOfN(_, genEntry))) { entries =>
      import graft.logs.LogProto
      val h = GrpcTestClient.requestHeaders(server.port)
      h.set("grpc-encoding", "gzip")
      val r = GrpcTestClient.call(conn, h,
        LogProto.frameGzipped(LogProto.encodeBatchWriteRequest(entries)))
      val ok = r.trailers != null &&
        r.trailers.get("grpc-status").toString == "0"
      val written =
        LogProto.decodeBatchWriteResponse(LogProto.unframe(r.bodyBytes))
      val got = received.poll()
      ok && written == entries.size.toLong && got == entries
    }

  property("gzip frame codec: frameGzipped ∘ unframe(gzip) = id; caps and corruption fail typed") = {
    import graft.logs.LogProto
    val genBytes = Gen.choose(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    forAll(genBytes) { b =>
      val framed = LogProto.frameGzipped(b)
      val roundTrip = LogProto.unframe(framed, "gzip", Int.MaxValue).sameElements(b)
      // the cap is on DECODED bytes: any message longer than the cap trips it
      val capped = b.length <= 8 || (try {
        LogProto.unframe(framed, "gzip", b.length - 1); false
      } catch { case _: LogProto.MessageTooLarge => true })
      // flag=1 without a negotiated coding is a typed malformed-proto error
      val identityRejects = try {
        LogProto.unframe(framed, "identity", Int.MaxValue); false
      } catch { case _: LogProto.MalformedProto => true }
      roundTrip && capped && identityRejects
    }
  }

  property("grpc-timeout parse: spec-shaped values round-trip, junk is rejected, never throws") = {
    val unitNanos = Map('H' -> 3600L * 1000000000L, 'M' -> 60L * 1000000000L,
      'S' -> 1000000000L, 'm' -> 1000000L, 'u' -> 1000L, 'n' -> 1L)
    val genValid = for {
      n <- Gen.choose(0L, 99999999L) // 1-8 digits per the PROTOCOL-HTTP2 spec
      u <- Gen.oneOf(unitNanos.keys.toSeq)
    } yield (n, u)
    val genJunk = Gen.oneOf(
      Gen.const(""), Gen.const(null: String),
      Gen.alphaStr.map(_.take(10)),                      // no digits
      Gen.choose(100000000L, Long.MaxValue / 2).map(n => s"${n}S"), // > 8 digits
      Gen.choose(0L, 999L).map(n => s"${n}x"),           // bad unit
      Gen.choose(1L, 999L).map(n => s"-${n}S"),          // sign
      genValid.map { case (n, u) => s"$n$u " })          // trailing garbage
    forAll(genValid) { case (n, u) =>
      GrpcServer.parseGrpcTimeoutNanos(s"$n$u").contains(n * unitNanos(u))
    } && forAll(genJunk) { s =>
      GrpcServer.parseGrpcTimeoutNanos(s).isEmpty
    }
  }

  // scalacheck Properties have no afterAll; reap on JVM exit
  sys.addShutdownHook {
    try {
      conn.close().sync()
      group.shutdownGracefully(0, 1, TimeUnit.SECONDS).sync()
      server.stop()
    } catch { case _: Exception => () }
  }
}
