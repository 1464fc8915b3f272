package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.logs.{LogApi, LogTable}
import graft.streaming.LogStream

/** The reference's full lifecycle in one test (SURVEY §3): wire-shaped
  * entries → streaming micro-batch ingest → partitioned table → validated
  * HTTP-shaped query returning the {logs, count, query} envelope. */
class LifecycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  case class Wire(ts: String, service: String, level: String, msg: String,
      attrs: Map[String, String], trace_id: String, span_id: String)

  test("ingest -> table -> query envelope end to end") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("lifecycle_table").toString
    val ckpt = Files.createTempDirectory("lifecycle_ckpt").toString

    val mem = MemoryStream[Wire]
    val q = LogStream.ingest(mem.toDF(), table, ckpt)
    mem.addData(
      Wire("2024-01-10T12:00:00Z", "orders", "INFO", "order placed",
        Map("user" -> "jane.smith", "order_id" -> "12346"), "tr1", "sp1"),
      Wire("2024-01-10T12:00:01Z", "orders", "ERROR", "payment failed",
        Map("user" -> "jane.smith"), "tr2", "sp2"),
      Wire("2024-01-10T12:00:02Z", "payments", "INFO", "ok", Map(), "tr3", "sp3"))
    q.processAllAvailable()
    q.stop()

    val logs = LogTable.read(spark, table)
    // README.md:54-65-shaped query: service + range + user filter
    val res = LogApi.query(logs, Map(
      "service" -> "orders",
      "from" -> "2024-01-10T00:00:00Z",
      "to" -> "2024-01-11T00:00:00Z",
      "user" -> "jane.smith"))
    assert(res.isRight)
    val env = res.toOption.get
    assert(env.count == 2)
    // ts-desc: the ERROR (later) row first
    assert(env.logs.head.getAs[String]("msg") == "payment failed")
    assert(env.query.service == "orders" && env.query.limit == 100)

    // retention then re-query: everything expires
    LogTable.retention(spark, table, java.sql.Timestamp.from(
      java.time.Instant.parse("2024-02-01T00:00:00Z")))
    val after = LogApi.query(LogTable.read(spark, table), Map(
      "service" -> "orders",
      "from" -> "2024-01-01T00:00:00Z", "to" -> "2024-02-01T00:00:00Z"))
    assert(after.toOption.get.count == 0)
  }
}
