package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.StatefulOps.{EventIn, SessionOut}

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def t(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("stateful sessionize: gap closes a session, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EventIn]
    val q = StatefulOps.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // batch 1: two events 10 min apart (one session so far, still open)
    mem.addData(
      EventIn(1, t("2024-01-01T00:00:00Z"), 7, "click", 1.0),
      EventIn(2, t("2024-01-01T00:10:00Z"), 7, "click", 1.0))
    q.processAllAvailable()
    // batch 2: an event 3 h later → the open session closes, new one opens
    mem.addData(EventIn(3, t("2024-01-01T03:00:00Z"), 7, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sess").as[SessionOut].collect()
    assert(closed.length == 1)
    assert(closed.head.user_id == 7L)
    assert(closed.head.session_start == t("2024-01-01T00:00:00Z"))
    assert(closed.head.session_end == t("2024-01-01T00:10:00Z"))
    assert(closed.head.n_events == 2L)
  }

  test("stream-stream interval join matches within the horizon only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val pur = MemoryStream[EventIn]
    val sig = MemoryStream[EventIn]
    val q = StatefulOps.purchasesAfterSignup(pur.toDF(), sig.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    sig.addData(
      EventIn(1, t("2024-01-01T00:00:00Z"), 7, "signup", 0.0),
      EventIn(2, t("2024-01-01T00:00:00Z"), 8, "signup", 0.0))
    pur.addData(
      EventIn(3, t("2024-01-01T01:00:00Z"), 7, "purchase", 9.0), // 1h after signup → match
      EventIn(4, t("2024-01-01T05:00:00Z"), 8, "purchase", 5.0), // 5h after → outside horizon
      EventIn(5, t("2024-01-01T01:00:00Z"), 9, "purchase", 1.0)) // no signup → no match
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("p_event") == 3L)
  }

  test("streaming dedup drops repeated (user_id, event_id)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EventIn]
    val q = StatefulOps.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    mem.addData(
      EventIn(1, t("2024-01-01T00:00:00Z"), 7, "click", 1.0),
      EventIn(1, t("2024-01-01T00:00:00Z"), 7, "click", 1.0)) // dup in batch
    q.processAllAvailable()
    mem.addData(EventIn(1, t("2024-01-01T00:01:00Z"), 7, "click", 2.0)) // dup across batches
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_out").count() == 1)
  }

  test("dedupStreamWithinWatermark: retries collapse, state expires with the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EventIn]
    val q = StatefulOps.dedupStreamWithinWatermark(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm_out").outputMode("append").start()
    mem.addData(EventIn(1, t("2024-01-01T00:00:00Z"), 7, "click", 1.0))
    q.processAllAvailable()
    // a retry of the same record with a refreshed timestamp, within the
    // delay of the first sighting → dropped; the far-future row advances
    // the watermark past the key's expiry (00:00 + 10 min)
    mem.addData(
      EventIn(1, t("2024-01-01T00:05:00Z"), 7, "click", 1.0),
      EventIn(9, t("2024-01-01T01:00:00Z"), 7, "view", 9.0))
    q.processAllAvailable()
    // same key again, long after its state expired → a NEW record (the
    // bounded-state contract: dedup holds within the horizon, not forever)
    mem.addData(EventIn(1, t("2024-01-01T01:00:00Z"), 7, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_wm_out").collect()
    assert(out.length == 3)
    assert(out.count(_.getAs[Long]("event_id") == 1L) == 2)
  }
}
