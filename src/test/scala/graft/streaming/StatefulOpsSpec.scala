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

  test("funnelStream: completes in order within windows, no double emission, stalls expire silently") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EventIn]
    val q = StatefulOps.funnelStream(mem.toDS(), Seq("a", "b", "c"), horizonHours = 1)
      .writeStream.format("memory").queryName("fun1").outputMode("append").start()
    mem.addData(
      // u1 completes: a 00:00, b 00:30, c 00:50
      EventIn(1, t("2024-01-01T00:00:00Z"), 1, "a", 0),
      EventIn(2, t("2024-01-01T00:30:00Z"), 1, "b", 0),
      EventIn(3, t("2024-01-01T00:50:00Z"), 1, "c", 0),
      // u1 again within the marker window -> must NOT re-emit
      EventIn(4, t("2024-01-01T01:00:00Z"), 1, "a", 0),
      EventIn(5, t("2024-01-01T01:10:00Z"), 1, "b", 0),
      EventIn(6, t("2024-01-01T01:20:00Z"), 1, "c", 0),
      // u2 stalls: b arrives 2h after a (outside the 1h window)
      EventIn(7, t("2024-01-01T00:00:00Z"), 2, "a", 0),
      EventIn(8, t("2024-01-01T02:00:00Z"), 2, "b", 0),
      // u3: wrong order (c before b)
      EventIn(9, t("2024-01-01T00:00:00Z"), 3, "a", 0),
      EventIn(10, t("2024-01-01T00:10:00Z"), 3, "c", 0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("fun1").as[StatefulOps.FunnelOut].collect()
    assert(out.length == 1)
    assert(out.head.user_id == 1L)
    assert(out.head.completed_at == t("2024-01-01T00:50:00Z"))
    assert(out.head.duration_ms == 50L * 60000L)
  }

  test("funnelStream: completion count matches the batch funnel on an ordered fixture replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val ev = graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventIn].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mid = ev(ev.length / 2).ts.getTime
    val (b1, b2) = ev.partition(_.ts.getTime <= mid)

    val mem = MemoryStream[EventIn]
    val q = StatefulOps.funnelStream(mem.toDS(), Seq("signup", "view", "purchase"),
      horizonHours = 6).writeStream.format("memory").queryName("fun2")
      .outputMode("append").start()
    mem.addData(b1.toSeq); q.processAllAvailable()
    mem.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("fun2").as[StatefulOps.FunnelOut].collect()

    val batchFinal = graft.analytics.Behavior.funnelCounts(
      graft.Tables.events(spark, dir), Seq("signup", "view", "purchase"), 6)
      .collect().last.getAs[Long]("n_users")
    assert(batchFinal > 0, "fixture should have conversions")
    assert(streamed.length.toLong == batchFinal)
    assert(streamed.map(_.user_id).distinct.length == streamed.length)
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

  test("counterIncreaseStream: reset restarts from zero, state crosses batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EventIn]
    val q = StatefulOps.counterIncreaseStream(mem.toDS())
      .writeStream.format("memory").queryName("cinc").outputMode("append").start()
    // batch 1: 100 → 180 (first sample counts in full, then +80)
    mem.addData(
      EventIn(1, t("2024-01-01T00:10:00Z"), 9, "view", 100.00),
      EventIn(2, t("2024-01-01T00:20:00Z"), 9, "view", 180.00))
    q.processAllAvailable()
    // batch 2: 30 (reset → +30), 50 (+20) — prior value carried via state
    mem.addData(
      EventIn(3, t("2024-01-01T01:10:00Z"), 9, "view", 30.00),
      EventIn(4, t("2024-01-01T01:20:00Z"), 9, "view", 50.00))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cinc").as[StatefulOps.IncreaseOut].collect()
      .sortBy(_.ts.getTime).map(_.increase_cents).toSeq
    assert(out == Seq(10000L, 8000L, 3000L, 2000L))
    // summed, it equals the batch operator's per-user increase total
    assert(out.sum == 23000L)
  }

  test("counterIncreaseStream: late out-of-order duplicate is skipped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EventIn]
    val q = StatefulOps.counterIncreaseStream(mem.toDS())
      .writeStream.format("memory").queryName("cinc2").outputMode("append").start()
    mem.addData(
      EventIn(1, t("2024-01-01T00:10:00Z"), 5, "view", 10.00),
      EventIn(2, t("2024-01-01T00:20:00Z"), 5, "view", 20.00))
    q.processAllAvailable()
    // a replay of event 1 (same ts/id) and an older-ts straggler: both skipped
    mem.addData(
      EventIn(1, t("2024-01-01T00:10:00Z"), 5, "view", 10.00),
      EventIn(0, t("2024-01-01T00:05:00Z"), 5, "view", 99.00))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cinc2").as[StatefulOps.IncreaseOut].collect()
    assert(out.length == 2)
    assert(out.map(_.increase_cents).sum == 2000L) // 1000 + 1000
  }

  test("lshCandidatesStream: pair emits when its second member arrives, across batches") {
    import StatefulOps.{BandIn, CandOut}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[BandIn]
    val q = StatefulOps.lshCandidatesStream(mem.toDS())
      .writeStream.format("memory").queryName("lsh_cand").outputMode("append").start()
    // batch 1: docs 10, 20 share bucket (0, 111); doc 30 alone in (1, 222)
    mem.addData(
      BandIn(10, 0, 111L), BandIn(20, 0, 111L), BandIn(30, 1, 222L),
      BandIn(10, 0, 111L)) // re-banded duplicate of doc 10: no self-pair
    q.processAllAvailable()
    val afterB1 = spark.table("lsh_cand").as[CandOut].collect().toSet
    assert(afterB1 == Set(CandOut(10, 20)))
    // batch 2: doc 5 lands in BOTH buckets → pairs against all stored
    // members, canonical orientation even though 5 < everything
    mem.addData(BandIn(5, 0, 111L), BandIn(5, 1, 222L))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("lsh_cand").as[CandOut].collect().toSet
    assert(all == Set(CandOut(10, 20), CandOut(5, 10), CandOut(5, 20),
      CandOut(5, 30)))
  }

  test("minhashParity: streamed LSH equals batch pairs on the sf0.001 corpus") {
    val row = ParityCheck.minhashParity(spark, SparkTestBase.sfDir).head()
    assert(row.getAs[Boolean]("parity_ok"),
      s"minhash stream/batch divergence: $row")
    assert(row.getAs[Long]("n_batch") > 0, "vacuous parity (no pairs)")
  }

  test("livePipelineParity: composed exact+LSH+label flow equals the batch twin") {
    val row = ParityCheck.livePipelineParity(spark, SparkTestBase.sfDir).head()
    assert(row.getAs[Boolean]("parity_ok"),
      s"live pipeline diverged from the batch twin: $row")
    // no tier may be vacuous: the exact tier dropped duplicate traffic
    // and the final labeling covers the whole kept corpus
    assert(row.getAs[Long]("n_dropped") > 0)
    assert(row.getAs[Long]("n_kept") > 0)
    assert(row.getAs[Long]("n_clusters") <= row.getAs[Long]("n_kept"))
  }
}
