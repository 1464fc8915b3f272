package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.logs.LogTable

class LogStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Wire-shaped record for the memory source (proto LogEntry fields). */
  case class Wire(ts: String, service: String, level: String, msg: String,
      attrs: Map[String, String], trace_id: String, span_id: String)

  test("stream ingest: wire rows → normalize → partitioned table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("stream_table").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString

    val mem = MemoryStream[Wire]
    val q = LogStream.ingest(mem.toDF(), table, ckpt)
    mem.addData(
      Wire("2024-01-05T01:02:03.456Z", "api", "INFO", "hello",
        Map("user" -> "jane"), "tr1", "sp1"),
      Wire("garbage-ts", "db", "WARN", "fallback", Map(), "tr2", "sp2"))
    q.processAllAvailable()
    mem.addData(
      Wire("2024-02-01T00:00:00Z", "api", "ERROR", "boom", Map("k" -> "v"), "tr3", "sp3"))
    q.processAllAvailable()
    q.stop()

    val got = LogTable.read(spark, table)
    assert(got.count() == 3)
    // month partitions derived from parsed ts (unparseable → now(), so its
    // month is the current month)
    val months = got.select(col("month")).distinct().collect().map(_.getString(0)).toSet
    assert(months.contains("202401") && months.contains("202402"))
    val jane = got.filter(get_json_object(col("attrs"), "$.user") === "jane").collect()
    assert(jane.length == 1 && jane.head.getAs[String]("msg") == "hello")
  }

  test("batchWrite acks accepted count before any sink commit (S1 contract)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("ack_table").toString
    val ckpt = Files.createTempDirectory("ack_ckpt").toString

    val mem = MemoryStream[Wire]
    val q = LogStream.ingest(mem.toDF(), table, ckpt)
    try {
      val entries = (1 to 5).map(i =>
        Wire(s"2024-01-0${i}T00:00:00Z", "api", "INFO", s"m$i", Map(), "", ""))
      val ack = LogStream.batchWrite(mem, entries)
      // ack = accepted count, issued before the micro-batch that persists
      // the rows has run — written != persisted at ack time
      assert(ack.written == 5)
      assert(!new java.io.File(table).exists() ||
        LogTable.read(spark, table).count() < 5)
      q.processAllAvailable()
      assert(LogTable.read(spark, table).count() == 5)
      // empty batch acks zero and admits nothing
      assert(LogStream.batchWrite(mem, Seq.empty[Wire]).written == 0)
    } finally q.stop()
  }
}
