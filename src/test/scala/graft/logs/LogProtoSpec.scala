package graft.logs

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contract of the hand-rolled proto3 codec: the GOLDEN bytes
  * are laid out by hand from the protobuf wire spec (field-number tags,
  * LEB128 lengths) exactly as protoc-generated Go marshalling emits them
  * for proto/log.proto — so any stock client interops. */
class LogProtoSpec extends AnyFunSuite {

  private def s(str: String): Array[Byte] = str.getBytes(UTF_8)

  private val entry = LogEntryMsg(
    ts = "2024-01-10T12:00:00Z", service = "orders", level = "INFO",
    msg = "ok", attrs = Map("user" -> "jane"), trace_id = "tr1", span_id = "sp1")

  // tag = (field << 3) | wire; wire 2 = length-delimited
  private val goldenEntry: Array[Byte] =
    Array[Byte](0x0A, 20) ++ s("2024-01-10T12:00:00Z") ++ // 1: ts
      (Array[Byte](0x12, 6) ++ s("orders")) ++ //            2: service
      (Array[Byte](0x1A, 4) ++ s("INFO")) ++ //              3: level
      (Array[Byte](0x22, 2) ++ s("ok")) ++ //                4: msg
      (Array[Byte](0x2A, 12, //                              5: attrs entry
        0x0A, 4) ++ s("user") ++ Array[Byte](0x12, 4) ++ s("jane")) ++
      (Array[Byte](0x32, 3) ++ s("tr1")) ++ //               6: trace_id
      (Array[Byte](0x3A, 3) ++ s("sp1")) //                  7: span_id

  test("LogEntry encodes to the protoc byte layout") {
    assert(LogProto.encodeEntry(entry).toSeq == goldenEntry.toSeq)
  }

  test("BatchWriteRequest wraps each entry as field 1; decode inverts") {
    val req = LogProto.encodeBatchWriteRequest(Seq(entry, entry))
    val one = Array[Byte](0x0A, goldenEntry.length.toByte) ++ goldenEntry
    assert(req.toSeq == (one ++ one).toSeq)
    assert(LogProto.decodeBatchWriteRequest(req) == Seq(entry, entry))
  }

  test("proto3 defaults are omitted on encode, restored on decode") {
    assert(LogProto.encodeEntry(LogEntryMsg()).isEmpty)
    assert(LogProto.decodeEntry(Array.empty) == LogEntryMsg())
    // an all-default entry still rides a request as a zero-length field
    val req = LogProto.encodeBatchWriteRequest(Seq(LogEntryMsg()))
    assert(req.toSeq == Seq[Byte](0x0A, 0))
    assert(LogProto.decodeBatchWriteRequest(req) == Seq(LogEntryMsg()))
  }

  test("BatchWriteResponse: varint uint64, zero omitted") {
    assert(LogProto.encodeBatchWriteResponse(0L).isEmpty)
    assert(LogProto.encodeBatchWriteResponse(3L).toSeq == Seq[Byte](0x08, 3))
    // 300 = 0xAC 0x02 LEB128
    assert(LogProto.encodeBatchWriteResponse(300L).toSeq ==
      Seq(0x08.toByte, 0xAC.toByte, 0x02.toByte))
    assert(LogProto.decodeBatchWriteResponse(Array(0x08.toByte, 0xAC.toByte, 0x02.toByte)) == 300L)
  }

  test("unknown fields are skipped by wire type (forward compat)") {
    // field 15 varint, field 9 fixed32, field 12 bytes — then a real ts
    val withUnknown =
      Array[Byte](0x78, 0x05) ++ //                    15<<3|0, value 5
        (Array[Byte](0x4D, 1, 2, 3, 4)) ++ //          9<<3|5, 4 bytes
        (Array[Byte](0x62, 2, 9, 9)) ++ //             12<<3|2, 2 bytes
        Array[Byte](0x0A, 2) ++ s("hi")
    assert(LogProto.decodeEntry(withUnknown) == LogEntryMsg(ts = "hi"))
  }

  test("duplicated scalar takes the LAST value; duplicate map key overwrites") {
    val dup = (Array[Byte](0x1A, 1) ++ s("A")) ++ (Array[Byte](0x1A, 1) ++ s("B"))
    assert(LogProto.decodeEntry(dup) == LogEntryMsg(level = "B"))
    val dupMap =
      (Array[Byte](0x2A, 6, 0x0A, 1) ++ s("k") ++ Array[Byte](0x12, 1) ++ s("1")) ++
        (Array[Byte](0x2A, 6, 0x0A, 1) ++ s("k") ++ Array[Byte](0x12, 1) ++ s("2"))
    assert(LogProto.decodeEntry(dupMap) == LogEntryMsg(attrs = Map("k" -> "2")))
  }

  test("malformed bytes are rejected, not mis-read") {
    def bad(b: Array[Byte]): Unit =
      intercept[LogProto.MalformedProto](LogProto.decodeEntry(b))
    bad(Array(0x0A.toByte)) //                length byte missing
    bad(Array(0x0A.toByte, 0x05.toByte, 'a'.toByte)) // length overruns
    bad(Array(0x80.toByte)) //                truncated varint tag
    bad(Array(0x0B.toByte)) //                wire type 3 (group) invalid
  }

  test("gRPC framing: flag + u32 BE length; compressed and bad lengths rejected") {
    val msg = LogProto.encodeBatchWriteRequest(Seq(entry))
    val framed = LogProto.frame(msg)
    assert(framed(0) == 0.toByte)
    assert(framed.length == msg.length + 5)
    val len = ((framed(1) & 0xff) << 24) | ((framed(2) & 0xff) << 16) |
      ((framed(3) & 0xff) << 8) | (framed(4) & 0xff)
    assert(len == msg.length)
    assert(LogProto.unframe(framed).toSeq == msg.toSeq)
    intercept[LogProto.MalformedProto](
      LogProto.unframe(Array[Byte](1, 0, 0, 0, 0))) // compressed flag
    intercept[LogProto.MalformedProto](
      LogProto.unframe(Array[Byte](0, 0, 0, 0, 9, 1))) // length mismatch
  }
}
