package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class BehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("funnelCounts: counts are monotonically non-increasing down the steps") {
    val out = Behavior.funnelCounts(Tables.events(spark, d),
      Seq("signup", "view", "purchase"), horizonHours = 6).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("step")).toSeq == Seq("signup", "view", "purchase"))
    val ns = out.map(_.getAs[Long]("n_users"))
    assert(ns.head > 0)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("funnelCounts: widening the horizon never loses users") {
    val narrow = Behavior.funnelCounts(Tables.events(spark, d),
      Seq("signup", "purchase"), horizonHours = 1).collect()
      .map(_.getAs[Long]("n_users"))
    val wide = Behavior.funnelCounts(Tables.events(spark, d),
      Seq("signup", "purchase"), horizonHours = 24).collect()
      .map(_.getAs[Long]("n_users"))
    assert(narrow.head == wide.head) // step 0 ignores the horizon
    assert(narrow(1) <= wide(1))
  }

  test("sequenceMatches: agrees with brute-force subsequence existence and emits the greedy witness") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // u1: a..b..c in order; u2: c before a,b (no match); u3: a,c only;
    // u4: interleaved with repeats — match exists, greedy picks earliest;
    // u5: b and c SIMULTANEOUS with a earlier — strict > rejects c at t(b)
    val rows = Seq(
      (1L, "a", 1), (1L, "x", 2), (1L, "b", 3), (1L, "c", 9),
      (2L, "c", 1), (2L, "a", 2), (2L, "b", 3),
      (3L, "a", 1), (3L, "c", 5),
      (4L, "a", 4), (4L, "b", 2), (4L, "a", 1), (4L, "b", 6), (4L, "c", 7), (4L, "b", 5),
      (5L, "a", 1), (5L, "b", 4), (5L, "c", 4)
    ).map { case (u, e, m) => (u, e, t(m)) }
    val ev = rows.toDF("user_id", "event_type", "ts")

    val got = Behavior.sequenceMatches(ev, Seq("a", "b", "c"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Timestamp]("t1"), r.getAs[Timestamp]("t2"), r.getAs[Timestamp]("t3"))).toMap

    // brute force: any strictly increasing (a,b,c) triple
    val expect = rows.groupBy(_._1).collect { case (u, es) =>
      val byType = (ty: String) => es.filter(_._2 == ty).map(_._3.getTime)
      val ok = byType("a").exists(ta => byType("b").exists(tb => tb > ta &&
        byType("c").exists(tc => tc > tb)))
      u -> ok
    }.filter(_._2).map(_._1).toSet
    assert(got.keySet == expect)
    assert(expect == Set(1L, 4L))
    // greedy witness for u4: earliest a=t(1), earliest b after it=t(2), earliest c=t(7)
    assert(got(4L) == ((t(1), t(2), t(7))))
  }

  test("sequenceCounts: closed form equals the pending-counter greedy on random streams") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(42)
    val types = Array("a", "b", "x")
    val rows = for {
      u <- 1 to 120
      i <- 1 to (1 + rnd.nextInt(12))
    } yield (u * 1000L + i, u.toLong, types(rnd.nextInt(3)),
      new Timestamp(1700000000000L + i * 60000L))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavior.sequenceCounts(ev, "a", "b").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_matches")).toMap

    // pending-counter greedy is optimal for max disjoint a-before-b pairs
    val expect = rows.groupBy(_._2).map { case (u, es) =>
      var pending = 0L; var matches = 0L
      es.sortBy(e => (e._4.getTime, e._1)).foreach {
        case (_, _, "a", _) => pending += 1
        case (_, _, "b", _) => if (pending > 0) { pending -= 1; matches += 1 }
        case _ =>
      }
      u -> matches
    }.filter(_._2 > 0)
    assert(got == expect)
    assert(expect.nonEmpty)
    // the interleaved stream where restart-scan counting would say 1
    val inter = Seq((1L, 9L, "a", new Timestamp(1L)), (2L, 9L, "a", new Timestamp(2L)),
      (3L, 9L, "b", new Timestamp(3L)), (4L, 9L, "b", new Timestamp(4L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(Behavior.sequenceCounts(inter, "a", "b").head.getAs[Long]("n_matches") == 2L)
  }

  test("windowFunnelLevels: chained-running-max closed form equals brute-force max level") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(11)
    val types = Array("a", "b", "c", "x")
    val rows = for {
      u <- 1 to 100
      i <- 1 to (1 + rnd.nextInt(10))
    } yield (u * 1000L + i, u.toLong, types(rnd.nextInt(4)),
      new Timestamp(1700000000000L + rnd.nextInt(600) * 60000L))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val windowMs = 3600000L // 1h window over a 10h spread
    val got = Behavior.windowFunnelLevels(ev, Seq("a", "b", "c"), windowHours = 1)
      .collect().map(r => r.getAs[Long]("level_idx") -> r.getAs[Long]("n_users")).toMap

    def maxLevel(es: Seq[(Long, Long, String, Timestamp)]): Int = {
      val sorted = es.sortBy(e => (e._4.getTime, e._1))
      def chains(steps: List[String], after: Long, anchor: Option[Long]): Boolean =
        steps match {
          case Nil => true
          case s :: rest => sorted.exists { e =>
            e._3 == s && e._4.getTime >= after &&
              anchor.forall(a => e._4.getTime - a <= windowMs) &&
              chains(rest, e._4.getTime, anchor.orElse(Some(e._4.getTime)))
          }
        }
      if (chains(List("a", "b", "c"), Long.MinValue, None)) 3
      else if (chains(List("a", "b"), Long.MinValue, None)) 2
      else if (sorted.exists(_._3 == "a")) 1
      else 0
    }
    val byUser = rows.groupBy(_._2).view.mapValues(maxLevel).toMap
    val expect = Map(
      0L -> byUser.values.count(_ >= 1).toLong,
      1L -> byUser.values.count(_ >= 2).toLong,
      2L -> byUser.values.count(_ >= 3).toLong)
    assert(got == expect)
    assert(expect(0L) > 0 && expect(2L) > 0)
    assert(expect(0L) >= expect(1L) && expect(1L) >= expect(2L))
  }

  test("sequenceCountsRestartScan: lag closed form equals the restart-scan simulation") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(7)
    val types = Array("a", "b", "x")
    val rows = for {
      u <- 1 to 120
      i <- 1 to (1 + rnd.nextInt(12))
    } yield (u * 1000L + i, u.toLong, types(rnd.nextInt(3)),
      new Timestamp(1700000000000L + i * 60000L))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavior.sequenceCountsRestartScan(ev, "a", "b").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_matches")).toMap

    // direct simulation of ClickHouse restart-scan semantics
    val expect = rows.groupBy(_._2).map { case (u, es) =>
      var waitingFor = "a"; var cnt = 0L
      es.sortBy(e => (e._4.getTime, e._1)).foreach { e =>
        if (e._3 == waitingFor) {
          if (waitingFor == "a") waitingFor = "b"
          else { cnt += 1; waitingFor = "a" }
        }
      }
      u -> cnt
    }.filter(_._2 > 0)
    assert(got == expect)
    assert(expect.nonEmpty)
    // the distinguishing stream: restart-scan 1, max-matching 2
    val inter = Seq((1L, 9L, "a", new Timestamp(1L)), (2L, 9L, "a", new Timestamp(2L)),
      (3L, 9L, "b", new Timestamp(3L)), (4L, 9L, "b", new Timestamp(4L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(Behavior.sequenceCountsRestartScan(inter, "a", "b").head.getAs[Long]("n_matches") == 1L)
    assert(Behavior.sequenceCounts(inter, "a", "b").head.getAs[Long]("n_matches") == 2L)
  }

  test("dailyRetention: rates in [0,1], retained never exceeds active, last day has successors=0 only if none") {
    val out = Behavior.dailyRetention(Tables.events(spark, d)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val active = r.getAs[Long]("n_active")
      val retained = r.getAs[Long]("n_retained")
      val rate = r.getAs[Double]("retention_rate")
      assert(active > 0 && retained >= 0 && retained <= active)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == retained.toDouble / active)
    }
  }

  test("topJourneys: first-k path extraction, short users, tie-break") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // u1, u2: view>click>buy; u3: view>click (short); u4: buy alone
    val rows = Seq(
      (1L, 1L, "view", 1), (2L, 1L, "click", 2), (3L, 1L, "buy", 3),
      (4L, 1L, "x", 4), // beyond steps=3, ignored
      (5L, 2L, "view", 1), (6L, 2L, "click", 2), (7L, 2L, "buy", 3),
      (8L, 3L, "view", 1), (9L, 3L, "click", 2),
      (10L, 4L, "buy", 1))
      .map { case (id, u, et, m) => (id, t(m), u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Behavior.topJourneys(rows, steps = 3, k = 10).collect()
      .map(r => (r.getAs[String]("journey"), r.getAs[Long]("n_users")))
    assert(out.head == ("view>click>buy", 2L))
    // ties at n=1: lexicographic ("buy" < "view>click")
    assert(out.drop(1).toSeq == Seq(("buy", 1L), ("view>click", 1L)))
  }

  test("cohortTriangle: cohorts by first day, dense counts, exact rates") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int, h: Int = 0) =
      Timestamp.valueOf(f"2024-01-0$day%d $h%02d:00:00")
    // cohort day1: users 1,2 (u1 returns day2 and day3; u2 returns day3)
    // cohort day2: user 3 only, never returns
    val rows = Seq(
      (1L, t(1), 1L), (2L, t(1, 5), 2L), (3L, t(2), 1L), (4L, t(3), 1L),
      (5L, t(3, 2), 2L), (6L, t(2, 9), 3L))
      .map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Behavior.cohortTriangle(rows).collect()
      .map(r => (r.getAs[Timestamp]("cohort"), r.getAs[Int]("age_days"),
        r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size")))
    assert(out.toSeq == Seq(
      (t(1), 0, 2L, 2L), (t(1), 1, 1L, 2L), (t(1), 2, 2L, 2L),
      (t(2), 0, 1L, 1L)))
  }

  test("sequenceNextNode: next event after chain end; NULL when chain ends last") {
    import spark.implicits._
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val ev = Seq(
      // u1: a@1 b@2 → next is c@3
      (1L, 1L, "a", ts(1)), (2L, 1L, "b", ts(2)), (3L, 1L, "c", ts(3)),
      // u2: a@1 b@5, nothing after → NULL next
      (4L, 2L, "a", ts(1)), (5L, 2L, "b", ts(5)),
      // u3: same-ts tie after chain: event_id decides (id 8 < id 9)
      (6L, 3L, "a", ts(1)), (7L, 3L, "b", ts(2)),
      (8L, 3L, "x", ts(4)), (9L, 3L, "y", ts(4)),
      // u4: b before a only → no chain, absent
      (10L, 4L, "b", ts(1)), (11L, 4L, "a", ts(2)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
    val out = Behavior.sequenceNextNode(ev, Seq("a", "b")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[String]("next_type")),
          Option(r.getAs[java.sql.Timestamp]("next_ts"))))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == (Some("c"), Some(ts(3))))
    assert(out(2L) == (None, None))
    assert(out(3L) == (Some("x"), Some(ts(4))))
  }
}
