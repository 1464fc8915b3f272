package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def t(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("streaming windowed counts equal the batch shape on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      Ev(1, t("2024-01-01T00:10:00Z"), 1, "click", 1.0),
      Ev(2, t("2024-01-01T05:59:59Z"), 1, "click", 2.0),
      Ev(3, t("2024-01-01T06:00:00Z"), 2, "click", 3.0), // next window
      Ev(4, t("2024-01-01T07:00:00Z"), 2, "view", 4.0))

    val mem = MemoryStream[Ev]
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("wc")
      .orderBy(col("w_start"), col("event_type")).collect()
    val batch = EventStream.windowedCounts(rows.toDF())
      .orderBy(col("w_start"), col("event_type")).collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    // window boundary: 05:59:59 in first window, 06:00:00 in second
    assert(batch.length == 3)
    assert(batch.head.getAs[Long]("n") == 2L)
  }

  test("watermark drops late rows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = EventStream.windowedCounts(mem.toDF(), windowLen = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("wc_append").outputMode("append").start()
    // advance event time far enough that the first window finalizes
    mem.addData(Ev(1, t("2024-01-01T00:10:00Z"), 1, "click", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(2, t("2024-01-01T03:00:00Z"), 1, "click", 1.0))
    q.processAllAvailable()
    // this row is hours behind the watermark → dropped
    mem.addData(Ev(3, t("2024-01-01T00:20:00Z"), 1, "click", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(4, t("2024-01-01T06:00:00Z"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wc_append").collect()
    // the 00:00 window emitted exactly once with count 1 (late row dropped)
    val w0 = out.filter(_.getAs[Timestamp]("w_start") == t("2024-01-01T00:00:00Z"))
    assert(w0.length == 1 && w0.head.getAs[Long]("n") == 1L)
  }

  test("live template mining: running counts match the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    case class Msg(msg: String, group_key: Long, ts: Timestamp)
    val rows = Seq(
      ("conn from 10.0.0.1 port 443", 1L, t("2024-01-01T00:00:00Z")),
      ("conn from 10.9.3.7 port 80", 2L, t("2024-01-01T00:01:00Z")),
      ("disk full on /dev/sda1", 3L, t("2024-01-01T00:02:00Z")),
      ("conn from 172.16.0.4 port 8080", 1L, t("2024-01-01T00:03:00Z")))
    val mem = MemoryStream[(String, Long, Timestamp)]
    val q = EventStream.templateCounts(
        mem.toDF().toDF("msg", "group_key", "ts"))
      .writeStream.format("memory").queryName("tpl").outputMode("complete").start()
    // two micro-batches — the running counts must accumulate across them
    mem.addData(rows.take(2): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tpl").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_msgs"), r.getAs[Long]("n_keys_approx"))).toMap
    assert(got.keySet == Set(
      "conn from <num>.<num>.<num>.<num> port <num>", "disk full on /dev/sda<num>"))
    assert(got("conn from <num>.<num>.<num>.<num> port <num>")._1 == 3L)
    assert(got("disk full on /dev/sda<num>")._1 == 1L)
    // approx distinct on 2 keys is exact at this cardinality
    assert(got("conn from <num>.<num>.<num>.<num> port <num>")._2 == 2L)
    // stream-vs-batch parity on (template, n_msgs, first/last seen)
    val batch = EventStream.templateCounts(
        rows.toDF("msg", "group_key", "ts"))
      .orderBy(col("template")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_msgs"),
        r.getAs[Timestamp]("first_seen"), r.getAs[Timestamp]("last_seen"))).toSeq
    val streamed = spark.table("tpl")
      .orderBy(col("template")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_msgs"),
        r.getAs[Timestamp]("first_seen"), r.getAs[Timestamp]("last_seen"))).toSeq
    assert(streamed == batch)
  }
}
