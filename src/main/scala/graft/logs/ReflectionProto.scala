package graft.logs

import java.io.ByteArrayOutputStream

import LogProto.{readLenDelim, readUvarint, skipField, writeBytesField,
  writeStringField, writeTag, writeUvarint}

/** gRPC server reflection (`grpc.reflection.v1.ServerReflection/
  * ServerReflectionInfo`) for the one-file service — the discovery
  * surface the reference gets for free from grpc-go's
  * `reflection.Register` (`cmd/server/main.go:78`), hand-rolled here
  * against the PUBLIC `reflection.proto` and `descriptor.proto` schemas
  * (the build resolves no protobuf artifacts).
  *
  * Served request kinds (the ones `grpcurl` uses):
  *  - `list_services` (field 7) → `list_services_response` (field 6) with
  *    the one registered service, `logs.v1.LogService`;
  *  - `file_containing_symbol` (field 4) for any `logs.v1.*` symbol, and
  *    `file_by_filename` (field 3) for `log.proto` → a
  *    `file_descriptor_response` (field 4) carrying the hand-encoded
  *    `FileDescriptorProto` of proto/log.proto (messages `LogEntry`
  *    — including the `AttrsEntry` map-entry nested type —
  *    `BatchWriteRequest`, `BatchWriteResponse`, service `LogService`);
  *  - unknown symbols/files → `error_response` (field 7) NOT_FOUND (5);
  *  - the extension queries (fields 5/6) → UNIMPLEMENTED (12), matching
  *    what grpc-go's reflection answers for proto3 services without
  *    extensions.
  *
  * Every response echoes `valid_host` (1) and `original_request` (2) per
  * the reflection contract. The v1alpha path serves the same bytes — the
  * message schema is identical and stock clients (grpcurl included)
  * still fall back to it.
  */
object ReflectionProto {

  val V1Path = "/grpc.reflection.v1.ServerReflection/ServerReflectionInfo"
  val V1AlphaPath = "/grpc.reflection.v1alpha.ServerReflection/ServerReflectionInfo"

  def isReflectionPath(p: String): Boolean = p == V1Path || p == V1AlphaPath

  val FileName = "log.proto"
  val ServiceName = "logs.v1.LogService"

  // ── descriptor.proto encoding (the subset log.proto needs) ──

  // FieldDescriptorProto.Type values (descriptor.proto enum)
  private val TypeUint64 = 4
  private val TypeString = 9
  private val TypeMessage = 11
  // FieldDescriptorProto.Label values
  private val LabelOptional = 1
  private val LabelRepeated = 3

  /** FieldDescriptorProto: 1 name, 3 number, 4 label, 5 type,
    * 6 type_name (leading-dot-qualified, message fields only). */
  private def fieldDesc(name: String, number: Int, label: Int, tpe: Int,
      typeName: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeStringField(out, 1, name)
    writeTag(out, 3, 0); writeUvarint(out, number.toLong)
    writeTag(out, 4, 0); writeUvarint(out, label.toLong)
    writeTag(out, 5, 0); writeUvarint(out, tpe.toLong)
    writeStringField(out, 6, typeName)
    out.toByteArray
  }

  /** DescriptorProto: 1 name, 2 field, 3 nested_type,
    * 7 options{map_entry=7}. */
  private def msgDesc(name: String, fields: Seq[Array[Byte]],
      nested: Seq[Array[Byte]] = Nil, mapEntry: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeStringField(out, 1, name)
    fields.foreach(writeBytesField(out, 2, _))
    nested.foreach(writeBytesField(out, 3, _))
    if (mapEntry) {
      val opts = new ByteArrayOutputStream()
      opts.write(Array[Byte]((7 << 3).toByte, 1)) // map_entry = true
      writeBytesField(out, 7, opts.toByteArray)
    }
    out.toByteArray
  }

  /** The FileDescriptorProto of proto/log.proto, byte-compatible with
    * what protoc emits for the reference's file (field order follows
    * declaration order; json_name and source info omitted — optional
    * fields reflection clients don't require). */
  lazy val logFileDescriptor: Array[Byte] = {
    val attrsEntry = msgDesc("AttrsEntry", Seq(
      fieldDesc("key", 1, LabelOptional, TypeString),
      fieldDesc("value", 2, LabelOptional, TypeString)),
      mapEntry = true)
    val logEntry = msgDesc("LogEntry", Seq(
      fieldDesc("ts", 1, LabelOptional, TypeString),
      fieldDesc("service", 2, LabelOptional, TypeString),
      fieldDesc("level", 3, LabelOptional, TypeString),
      fieldDesc("msg", 4, LabelOptional, TypeString),
      fieldDesc("attrs", 5, LabelRepeated, TypeMessage, ".logs.v1.LogEntry.AttrsEntry"),
      fieldDesc("trace_id", 6, LabelOptional, TypeString),
      fieldDesc("span_id", 7, LabelOptional, TypeString)),
      nested = Seq(attrsEntry))
    val batchReq = msgDesc("BatchWriteRequest", Seq(
      fieldDesc("entries", 1, LabelRepeated, TypeMessage, ".logs.v1.LogEntry")))
    val batchResp = msgDesc("BatchWriteResponse", Seq(
      fieldDesc("written", 1, LabelOptional, TypeUint64)))
    // ServiceDescriptorProto: 1 name, 2 method(MethodDescriptorProto:
    // 1 name, 2 input_type, 3 output_type)
    val method = {
      val out = new ByteArrayOutputStream()
      writeStringField(out, 1, "BatchWrite")
      writeStringField(out, 2, ".logs.v1.BatchWriteRequest")
      writeStringField(out, 3, ".logs.v1.BatchWriteResponse")
      out.toByteArray
    }
    val service = {
      val out = new ByteArrayOutputStream()
      writeStringField(out, 1, "LogService")
      writeBytesField(out, 2, method)
      out.toByteArray
    }
    // FileDescriptorProto: 1 name, 2 package, 4 message_type, 6 service,
    // 12 syntax
    val out = new ByteArrayOutputStream()
    writeStringField(out, 1, FileName)
    writeStringField(out, 2, "logs.v1")
    Seq(logEntry, batchReq, batchResp).foreach(writeBytesField(out, 4, _))
    writeBytesField(out, 6, service)
    writeStringField(out, 12, "proto3")
    out.toByteArray
  }

  // ── ServerReflectionRequest / ServerReflectionResponse ──

  /** Decoded request: `raw` is kept verbatim for the response echo. */
  final case class ReflectionRequest(
      raw: Array[Byte],
      host: String = "",
      fileByFilename: Option[String] = None,
      fileContainingSymbol: Option[String] = None,
      listServices: Option[String] = None,
      unsupported: Boolean = false)

  def decodeRequest(b: Array[Byte]): ReflectionRequest = {
    var req = ReflectionRequest(raw = b)
    var p = 0
    while (p < b.length) {
      val (tag, q) = readUvarint(b, p)
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      def str: (String, Int) = {
        val (bs, r) = readLenDelim(b, q)
        (new String(bs, java.nio.charset.StandardCharsets.UTF_8), r)
      }
      field match {
        case 1 => val (s, r) = str; req = req.copy(host = s); p = r
        case 3 => val (s, r) = str; req = req.copy(fileByFilename = Some(s)); p = r
        case 4 => val (s, r) = str; req = req.copy(fileContainingSymbol = Some(s)); p = r
        case 5 | 6 => req = req.copy(unsupported = true); p = skipField(b, q, wire)
        case 7 => val (s, r) = str; req = req.copy(listServices = Some(s)); p = r
        case _ => p = skipField(b, q, wire)
      }
    }
    req
  }

  /** One ServerReflectionResponse for one request — the unary turn of
    * the bidi stream. */
  def respond(raw: Array[Byte]): Array[Byte] = {
    val req = decodeRequest(raw)
    val out = new ByteArrayOutputStream()
    writeStringField(out, 1, req.host) // valid_host echo
    writeBytesField(out, 2, raw)       // original_request echo
    if (req.unsupported) {
      writeBytesField(out, 7, errorResponse(12,
        "extension reflection is not supported"))
    } else if (req.listServices.isDefined) {
      val svc = new ByteArrayOutputStream()
      writeStringField(svc, 1, ServiceName)
      val list = new ByteArrayOutputStream()
      writeBytesField(list, 1, svc.toByteArray)
      writeBytesField(out, 6, list.toByteArray)
    } else if (req.fileContainingSymbol.exists(s =>
        s == "logs.v1" || s.startsWith("logs.v1."))) {
      writeBytesField(out, 4, fileDescriptorResponse)
    } else if (req.fileByFilename.exists(f =>
        f == FileName || f == s"proto/$FileName")) {
      writeBytesField(out, 4, fileDescriptorResponse)
    } else if (req.fileContainingSymbol.isDefined || req.fileByFilename.isDefined) {
      val what = req.fileContainingSymbol.orElse(req.fileByFilename).get
      writeBytesField(out, 7, errorResponse(5, s"not found: $what")) // NOT_FOUND
    } else {
      writeBytesField(out, 7, errorResponse(12, "unrecognized reflection request"))
    }
    out.toByteArray
  }

  /** FileDescriptorResponse { repeated bytes file_descriptor_proto = 1 } */
  private def fileDescriptorResponse: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeBytesField(out, 1, logFileDescriptor)
    out.toByteArray
  }

  /** ErrorResponse { int32 error_code = 1; string error_message = 2 } */
  private def errorResponse(code: Int, message: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeTag(out, 1, 0); writeUvarint(out, code.toLong)
    writeStringField(out, 2, message)
    out.toByteArray
  }
}
