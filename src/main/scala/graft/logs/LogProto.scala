package graft.logs

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** The wire-typed `LogEntry` (proto/log.proto:6-14): every field carries
  * its proto3 default when absent, so a decoded message is directly the
  * wire row [[graft.streaming.LogStream]] normalizes — field names match
  * [[LogSchema.wireSchema]] column names (an `Encoder[LogEntryMsg]`
  * therefore yields exactly the wire columns). */
final case class LogEntryMsg(
    ts: String = "",
    service: String = "",
    level: String = "",
    msg: String = "",
    attrs: Map[String, String] = Map.empty,
    trace_id: String = "",
    span_id: String = "")

/** Hand-rolled proto3 binary codec for the reference's wire contract
  * (proto/log.proto): `LogEntry` (fields 1-7; 5 is a map<string,string>),
  * `BatchWriteRequest { repeated LogEntry entries = 1 }` and
  * `BatchWriteResponse { uint64 written = 1 }` — the byte layout the
  * generated `log.pb.go` emits, produced without a protobuf dependency
  * (the build is dependency-free; sbt has no egress).
  *
  * Encoding follows the canonical protoc conventions so bytes interop
  * with any stock protobuf client:
  *  - unsigned LEB128 varints for tags, lengths, and uint64;
  *  - length-delimited (wire type 2) UTF-8 strings, nested messages, and
  *    map entries (`{1: key, 2: value}` submessages, one per pair);
  *  - default-valued scalar fields are omitted; repeated message fields
  *    are always emitted (even a zero-length entry).
  *
  * Decoding is position-driven and accepts any field order, skips unknown
  * fields by wire type (forward compatibility), lets a duplicated scalar
  * field take the LAST value and a duplicated map key overwrite — all
  * proto3-mandated behaviors. Truncated or structurally invalid bytes
  * throw [[LogProto.MalformedProto]], which the HTTP transport maps to a
  * client error.
  *
  * [[frame]]/[[unframe]] add the gRPC message framing (1-byte compressed
  * flag + u32 big-endian length, gRPC over HTTP/2 §Length-Prefixed-Message)
  * so the HTTP-mounted route speaks the same payload bytes a gRPC channel
  * would carry; the HTTP/2 transport itself stays out of scope (SURVEY
  * §2.1).
  */
object LogProto {

  final class MalformedProto(msg: String) extends IllegalArgumentException(msg)

  private def fail(msg: String): Nothing = throw new MalformedProto(msg)

  // ── varint + primitive writers ──

  private[logs] def writeUvarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7fL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write((v & 0x7fL).toInt)
  }

  /** (value, next position); bounds- and length-checked (≤ 10 bytes). */
  private[logs] def readUvarint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = pos
    while (true) {
      if (i >= b.length) fail("truncated varint")
      if (shift >= 70) fail("varint longer than 10 bytes")
      val x = b(i)
      v |= (x & 0x7fL) << shift
      i += 1
      if ((x & 0x80) == 0) return (v, i)
      shift += 7
    }
    sys.error("unreachable")
  }

  private[logs] def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeUvarint(out, (field.toLong << 3) | wire.toLong)

  private[logs] def writeStringField(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    if (s != null && s.nonEmpty) {
      val bytes = s.getBytes(UTF_8)
      writeTag(out, field, 2)
      writeUvarint(out, bytes.length.toLong)
      out.write(bytes, 0, bytes.length)
    }

  private[logs] def writeBytesField(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeUvarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  /** (bytes, next position) of a length-delimited payload at `pos`. */
  private[logs] def readLenDelim(b: Array[Byte], pos: Int): (Array[Byte], Int) = {
    val (len, p) = readUvarint(b, pos)
    if (len < 0 || len > (b.length - p).toLong) fail(s"length $len overruns buffer")
    (java.util.Arrays.copyOfRange(b, p, p + len.toInt), p + len.toInt)
  }

  /** Skip one field of `wire` type at `pos`; groups (wire 3/4) are
    * proto3-invalid and rejected. */
  private[logs] def skipField(b: Array[Byte], pos: Int, wire: Int): Int = wire match {
    case 0 => readUvarint(b, pos)._2
    case 1 => if (pos + 8 > b.length) fail("truncated fixed64") else pos + 8
    case 2 => val (len, p) = readUvarint(b, pos)
      if (len < 0 || len > (b.length - p).toLong) fail("truncated bytes")
      p + len.toInt
    case 5 => if (pos + 4 > b.length) fail("truncated fixed32") else pos + 4
    case w => fail(s"unsupported wire type $w")
  }

  // ── LogEntry ──

  def encodeEntry(e: LogEntryMsg): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeStringField(out, 1, e.ts)
    writeStringField(out, 2, e.service)
    writeStringField(out, 3, e.level)
    writeStringField(out, 4, e.msg)
    e.attrs.foreach { case (k, v) =>
      val entry = new ByteArrayOutputStream()
      writeStringField(entry, 1, k)
      writeStringField(entry, 2, v)
      writeBytesField(out, 5, entry.toByteArray)
    }
    writeStringField(out, 6, e.trace_id)
    writeStringField(out, 7, e.span_id)
    out.toByteArray
  }

  private def decodeMapEntry(b: Array[Byte]): (String, String) = {
    var pos = 0
    var k = ""
    var v = ""
    while (pos < b.length) {
      val (tag, p) = readUvarint(b, pos)
      (tag >>> 3, (tag & 7L).toInt) match {
        case (1L, 2) => val (bs, q) = readLenDelim(b, p); k = new String(bs, UTF_8); pos = q
        case (2L, 2) => val (bs, q) = readLenDelim(b, p); v = new String(bs, UTF_8); pos = q
        case (_, w) => pos = skipField(b, p, w)
      }
    }
    (k, v)
  }

  def decodeEntry(b: Array[Byte]): LogEntryMsg = {
    var e = LogEntryMsg()
    var pos = 0
    while (pos < b.length) {
      val (tag, p) = readUvarint(b, pos)
      def str: (String, Int) = { val (bs, q) = readLenDelim(b, p); (new String(bs, UTF_8), q) }
      (tag >>> 3, (tag & 7L).toInt) match {
        case (1L, 2) => val (s, q) = str; e = e.copy(ts = s); pos = q
        case (2L, 2) => val (s, q) = str; e = e.copy(service = s); pos = q
        case (3L, 2) => val (s, q) = str; e = e.copy(level = s); pos = q
        case (4L, 2) => val (s, q) = str; e = e.copy(msg = s); pos = q
        case (5L, 2) =>
          val (bs, q) = readLenDelim(b, p)
          val (k, v) = decodeMapEntry(bs)
          e = e.copy(attrs = e.attrs + (k -> v)); pos = q
        case (6L, 2) => val (s, q) = str; e = e.copy(trace_id = s); pos = q
        case (7L, 2) => val (s, q) = str; e = e.copy(span_id = s); pos = q
        case (_, w) => pos = skipField(b, p, w)
      }
    }
    e
  }

  // ── BatchWriteRequest / BatchWriteResponse ──

  def encodeBatchWriteRequest(entries: Seq[LogEntryMsg]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach(e => writeBytesField(out, 1, encodeEntry(e)))
    out.toByteArray
  }

  def decodeBatchWriteRequest(b: Array[Byte]): Seq[LogEntryMsg] = {
    val entries = Seq.newBuilder[LogEntryMsg]
    var pos = 0
    while (pos < b.length) {
      val (tag, p) = readUvarint(b, pos)
      (tag >>> 3, (tag & 7L).toInt) match {
        case (1L, 2) =>
          val (bs, q) = readLenDelim(b, p)
          entries += decodeEntry(bs); pos = q
        case (_, w) => pos = skipField(b, p, w)
      }
    }
    entries.result()
  }

  def encodeBatchWriteResponse(written: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (written != 0L) { writeTag(out, 1, 0); writeUvarint(out, written) }
    out.toByteArray
  }

  def decodeBatchWriteResponse(b: Array[Byte]): Long = {
    var written = 0L
    var pos = 0
    while (pos < b.length) {
      val (tag, p) = readUvarint(b, pos)
      (tag >>> 3, (tag & 7L).toInt) match {
        case (1L, 0) => val (v, q) = readUvarint(b, p); written = v; pos = q
        case (_, w) => pos = skipField(b, p, w)
      }
    }
    written
  }

  // ── gRPC Length-Prefixed-Message framing ──

  /** `[compressed=0][u32 BE length][message]`. */
  def frame(message: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(message.length + 5)
    out.write(0)
    out.write((message.length >>> 24) & 0xff)
    out.write((message.length >>> 16) & 0xff)
    out.write((message.length >>> 8) & 0xff)
    out.write(message.length & 0xff)
    out.write(message, 0, message.length)
    out.toByteArray
  }

  /** Strip one gRPC frame; rejects the compressed flag (no codec is
    * negotiated on this transport — the HTTP-mounted route) and length
    * mismatches. */
  def unframe(b: Array[Byte]): Array[Byte] = unframe(b, "identity", Int.MaxValue)

  /** Strip one gRPC frame honoring the per-message compressed flag under
    * the stream's negotiated `grpc-encoding`: flag 0 → message bytes
    * as-is; flag 1 under `gzip` → inflate (size-capped — the cap applies
    * to the DECODED message, grpc-go's receive-size semantics, surfacing
    * as [[MessageTooLarge]] → RESOURCE_EXHAUSTED); flag 1 under
    * `identity` → [[MalformedProto]] (spec: compressed-flag set without a
    * negotiated encoding is an INTERNAL error). Unknown encodings never
    * reach here — the transport rejects them at HEADERS time with
    * UNIMPLEMENTED. */
  def unframe(b: Array[Byte], encoding: String, maxBytes: Int): Array[Byte] = {
    if (b.length < 5) fail("gRPC frame shorter than 5 bytes")
    val len = ((b(1) & 0xffL) << 24) | ((b(2) & 0xffL) << 16) |
      ((b(3) & 0xffL) << 8) | (b(4) & 0xffL)
    if (len != (b.length - 5).toLong) fail(s"gRPC frame length $len != ${b.length - 5}")
    decodePayload(b(0), java.util.Arrays.copyOfRange(b, 5, b.length),
      encoding, maxBytes)
  }

  /** Decode one frame's payload given its compressed-flag byte — shared
    * by [[unframe]] and the incremental reflection drain (which parses
    * the 5-byte prefix out of a netty buffer itself). */
  def decodePayload(flag: Byte, payload: Array[Byte], encoding: String,
      maxBytes: Int): Array[Byte] = flag match {
    case 0 => payload
    case 1 =>
      if (encoding == "gzip") gunzip(payload, maxBytes)
      else fail("compressed-flag set but grpc-encoding is identity")
    case f => fail(s"invalid gRPC frame flag $f")
  }

  /** Decoded message exceeded the receive cap (→ RESOURCE_EXHAUSTED,
    * distinct from [[MalformedProto]]'s INTERNAL). */
  final class MessageTooLarge(msg: String) extends RuntimeException(msg)

  /** `[compressed=1][u32 BE length][gzip(message)]` — the framing a
    * gzip-negotiated client sends per message. */
  def frameGzipped(message: Array[Byte]): Array[Byte] = {
    val gz = gzip(message)
    val out = new ByteArrayOutputStream(gz.length + 5)
    out.write(1)
    out.write((gz.length >>> 24) & 0xff)
    out.write((gz.length >>> 16) & 0xff)
    out.write((gz.length >>> 8) & 0xff)
    out.write(gz.length & 0xff)
    out.write(gz, 0, gz.length)
    out.toByteArray
  }

  /** RFC 1952 gzip via the JDK (the build carries no compression deps). */
  def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b)
    gz.close()
    bos.toByteArray
  }

  /** Inflate, failing fast ([[MessageTooLarge]]) the moment the DECODED
    * size passes `maxBytes` — a gzip bomb must not buffer unbounded
    * bytes before the cap is noticed. Corrupt streams surface as
    * [[MalformedProto]] (→ INTERNAL, the unmarshal-failure mapping). */
  def gunzip(b: Array[Byte], maxBytes: Int): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new ByteArrayOutputStream(math.min(b.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > maxBytes)
          throw new MessageTooLarge(
            s"grpc: received message larger than max ($maxBytes)")
        n = in.read(buf)
      }
      out.toByteArray
    } catch {
      case e: java.io.IOException => fail(s"corrupt gzip frame: ${e.getMessage}")
    }

  /** A valid protobuf message can never start with byte 0x00 or 0x01 (the
    * tag would name field 0, which proto reserves), so the framing sniff
    * is unambiguous: flag byte + plausible length → gRPC-framed body. */
  def looksFramed(b: Array[Byte]): Boolean =
    b.length >= 5 && (b(0) == 0.toByte || b(0) == 1.toByte)
}
