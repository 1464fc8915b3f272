package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class AnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("rateAnomalies: every flagged hour exceeds the threshold; raising it shrinks the set") {
    val ev = Tables.events(spark, SparkTestBase.sfDir)
    val at2 = Anomaly.rateAnomalies(ev, 2.0).collect()
    val at3 = Anomaly.rateAnomalies(ev, 3.0).collect()
    assert(at2.nonEmpty, "fixture should contain some >2-sigma hours")
    at2.foreach(r => assert(math.abs(r.getAs[Double]("z")) > 2.0))
    assert(at3.length <= at2.length)
    val k2 = at2.map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr"))).toSet
    val k3 = at3.map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr"))).toSet
    assert(k3.subsetOf(k2))
  }

  /** Events yielding `counts(i)` rows in hour i of 2024-01-01, one type. */
  private def hourly(counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(j => ((h * 1000 + j).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:${j % 60}%02d"),
        1L, "view", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("madAnomalies flags repeated spikes that inflate sigma past the z-score") {
    // 9 quiet hours at 10, 3 incident hours at 100: sigma balloons to ~41,
    // so z = 1.66 and the z-score alert at 2.0 stays silent — the classic
    // masked repeated incident. The median is immovable: MAD flags all 3.
    val ev = hourly(Seq(10, 10, 10, 100, 10, 10, 100, 10, 10, 10, 100, 10))
    assert(Anomaly.rateAnomalies(ev, 2.0).collect().isEmpty)
    val mad = Anomaly.madAnomalies(ev, k = 3).collect()
    assert(mad.length == 3)
    assert(mad.forall(_.getAs[Long]("n") == 100L))
    assert(mad.forall(_.getAs[Long]("med") == 10L))
  }

  test("sloBurn: burn > 1 exactly when the hour's error fraction exceeds the budget") {
    // 1000 events in hour 0 with 2 errors (rate 0.002 > budget 0.001 →
    // burn 2); hour 1 has 1000 with 1 error (burn exactly 1).
    import spark.implicits._
    val rows = (0 until 1000).map { j =>
      ((j).toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${j % 60}%02d:00"),
        1L, if (j < 2) "error" else "view", 1.0, "{}")
    } ++ (0 until 1000).map { j =>
      ((10000 + j).toLong, java.sql.Timestamp.valueOf(f"2024-01-01 01:${j % 60}%02d:00"),
        1L, if (j < 1) "error" else "view", 1.0, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Anomaly.sloBurn(df, slo = 0.999).collect()
    assert(out.length == 2)
    assert(math.abs(out(0).getAs[Double]("burn_rate") - 2.0) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("burn_rate") - 1.0) < 1e-9)
  }

  test("apdex: (satisfied + tolerating/2) / total with exact boundaries") {
    import spark.implicits._
    // values 50 (satisfied, = T/2), 100 (satisfied, = T exactly),
    // 400 (tolerating, = 4T exactly), 401 (frustrated)
    val rows = Seq(50.00, 100.00, 400.00, 401.00).zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "api", v, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Anomaly.apdex(df, tCents = 10000L).collect()(0)
    assert(r.getAs[Long]("n_satisfied") == 2L)
    assert(r.getAs[Long]("n_tolerating") == 1L)
    assert(r.getAs[Double]("apdex") == (2.0 * 2 + 1) / 8.0) // (2+0.5)/4
  }

  test("madAnomalies: quiet keys flag nothing; MAD=0 flags any deviation") {
    val flat = hourly(Seq(10, 10, 10, 10))
    assert(Anomaly.madAnomalies(flat).collect().isEmpty)
    val oneOff = hourly(Seq(10, 10, 10, 11))
    val r = Anomaly.madAnomalies(oneOff).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n") == 11L &&
      r(0).getAs[Long]("mad") == 0L)
  }
  test("cusumShift: level shift accumulates to the hand-computed peak") {
    // counts 2,2,2,8,8,8: m=6, T=30, scaled devs -18 x3 then +18 x3;
    // cusum ramps 0,0,0,18,36,54 -> peak 54 at hour 5
    val r = Anomaly.cusumShift(hourly(Seq(2, 2, 2, 8, 8, 8))).collect().head
    assert(r.getAs[Long]("n_hours") == 6L)
    assert(r.getAs[Long]("max_cusum") == 54L)
    assert(r.getAs[java.sql.Timestamp]("peak_hr").toString.startsWith("2024-01-01 05:00"))
  }

  test("cusumShift: flat series peaks at zero, earliest hour on ties") {
    val r = Anomaly.cusumShift(hourly(Seq(5, 5, 5))).collect().head
    assert(r.getAs[Long]("max_cusum") == 0L)
    assert(r.getAs[java.sql.Timestamp]("peak_hr").toString.startsWith("2024-01-01 00:00"))
  }

}
