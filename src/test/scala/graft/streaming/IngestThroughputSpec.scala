package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.logs.LogTable

/** Ingest-path throughput smoke: the reference's implied steady-state
  * floor is ≥5,000 rows/s (500-row flush per 100 ms — batcher.go:20-25);
  * the streaming path must beat that comfortably on a single node. */
class IngestThroughputSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  case class W(ts: String, service: String, level: String, msg: String,
      attrs: Map[String, String], trace_id: String, span_id: String)

  test("streaming ingest sustains well above the reference's 5k rows/s floor") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("tp_table").toString
    val ckpt = Files.createTempDirectory("tp_ckpt").toString
    val n = 50000
    val rows = (0 until n).map { i =>
      W(f"2024-01-${1 + i % 28}%02dT12:00:${i % 60}%02dZ", s"svc${i % 5}", "INFO",
        s"msg $i", Map("user" -> s"u${i % 100}"), s"tr$i", s"sp$i")
    }
    val mem = MemoryStream[W]
    val q = LogStream.ingest(mem.toDF(), table, ckpt)
    val t0 = System.nanoTime()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    assert(LogTable.read(spark, table).count() == n)
    val rate = n / secs
    info(f"ingest rate: $rate%.0f rows/s over $n rows")
    assert(rate > 5000, f"rate $rate%.0f rows/s below the reference floor")
  }
}
