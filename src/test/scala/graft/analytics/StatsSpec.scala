package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ev(rows: Seq[(String, Long, Double, String)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((t, u, v, ts), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(ts), u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("welch t: higher-mean group yields the expected sign and magnitude") {
    // a ~ N(100), b ~ N(50): decisively separated, t large positive
    val rows = (0 until 100).map(i => ("a", i.toLong, 100.0 + (i % 7), "2024-01-01 00:00:00")) ++
      (0 until 100).map(i => ("b", i.toLong, 50.0 + (i % 5), "2024-01-01 00:00:00"))
    val r = Stats.welchTTest(ev(rows)).collect().head
    assert(r.getAs[String]("type_a") == "a" && r.getAs[String]("type_b") == "b")
    assert(r.getAs[Double]("mean_a") > r.getAs[Double]("mean_b"))
    assert(r.getAs[Double]("t") > 10.0, s"t=${r.getAs[Double]("t")}")
    assert(r.getAs[Double]("df") > 50.0)
  }

  test("welch t: identical distributions give t == 0") {
    val rows = (0 until 60).flatMap(i =>
      Seq(("a", i.toLong, 10.0 + (i % 3), "2024-01-01 00:00:00"),
        ("b", i.toLong, 10.0 + (i % 3), "2024-01-01 00:00:00")))
    val r = Stats.welchTTest(ev(rows)).collect().head
    assert(r.getAs[Double]("t") == 0.0)
  }

  test("cramers v: type independent of weekday is ~0; determined is ~1") {
    // independent: every type occurs equally on both weekdays
    val ind = (0 until 80).flatMap { i =>
      val day = if (i % 2 == 0) "2024-01-01 10:00:00" else "2024-01-02 10:00:00"
      Seq(("x", i.toLong, 1.0, day), ("y", i.toLong, 1.0, day))
    }
    val vInd = Stats.cramersV(ev(ind)).collect().head.getAs[Double]("v")
    assert(vInd == 0.0, s"independent v=$vInd")
    // determined: type x only Monday, type y only Tuesday
    val dep = (0 until 80).map(i => ("x", i.toLong, 1.0, "2024-01-01 10:00:00")) ++
      (0 until 80).map(i => ("y", i.toLong, 1.0, "2024-01-02 10:00:00"))
    val vDep = Stats.cramersV(ev(dep)).collect().head.getAs[Double]("v")
    assert(math.abs(vDep - 1.0) < 1e-12, s"determined v=$vDep")
  }

  test("linreg recovers a planted slope exactly (integral inputs)") {
    // value = 2 cents/hour * x + 500 cents: y(x) = 5 + 0.02*x dollars
    val rows = (0 until 200).map { i =>
      val ts = java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(i.toLong)
      ("a", i.toLong, 5.0 + 0.02 * i,
        java.sql.Timestamp.valueOf(ts).toString.stripSuffix(".0"))
    }
    val r = Stats.groupLinReg(ev(rows)).collect().head
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9,
      s"slope=${r.getAs[Double]("slope")}")
    assert(math.abs(r.getAs[Double]("intercept") - 500.0) < 1e-6)
  }

  test("type diversity: single-type user scores 0, uniform 4-type ~750M ppb") {
    val rows = (0 until 40).map(i => ("only", 1L, 1.0, "2024-01-01 00:00:00")) ++
      (0 until 40).map(i => (Seq("a", "b", "c", "d")(i % 4), 2L, 1.0, "2024-01-01 00:00:00"))
    val out = Stats.typeDiversity(ev(rows)).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("simpson_ppb")).toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 750000000L)
  }

  test("stats are deterministic under repartition (ordered chi2 fold)") {
    val rows = (0 until 500).map(i =>
      (Seq("a", "b", "c")(i % 3), (i % 29).toLong, (i % 13) + 0.25,
        s"2024-01-${1 + i % 28} ${i % 24}:00:00"))
    val base = ev(rows)
    def all(df: org.apache.spark.sql.DataFrame) = Seq(
      Stats.welchTTest(df).collect().toSeq,
      Stats.cramersV(df).collect().toSeq,
      Stats.groupLinReg(df).collect().toSeq,
      Stats.typeDiversity(df).collect().toSeq)
    assert(all(base) == all(base.repartition(11)))
  }
  test("ks: half-shifted samples give D = 1/2 ppb; disjoint give 1e9") {
    val mk = (vs: Seq[(String, Double)]) =>
      ev(vs.zipWithIndex.map { case ((t, v), i) => (t, i.toLong, v, "2024-01-01 00:00:00") })
    val half = mk(Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++ Seq(3.0, 4.0, 5.0, 6.0).map(("b", _)))
    val r = Stats.ksTest(half, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 4L, 500000000L)))
    val disj = mk(Seq(1.0, 2.0).map(("a", _)) ++ Seq(3.0, 4.0).map(("b", _)))
    assert(Stats.ksTest(disj, "a", "b").collect().head.getLong(2) == 1000000000L)
  }

  test("mann-whitney: separated samples give U = 0; ties use doubled midranks") {
    val mk = (vs: Seq[(String, Double)]) =>
      ev(vs.zipWithIndex.map { case ((t, v), i) => (t, i.toLong, v, "2024-01-01 00:00:00") })
    val sep = mk(Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)))
    val r = Stats.mannWhitneyU(sep, "a", "b").collect().head
    // ranks of a = {1,2} -> r2_a = 6, u2_a = 6 - 2*3 = 0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 2L, 6L, 0L)))
    val tied = mk(Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)))
    val t = Stats.mannWhitneyU(tied, "a", "b").collect().head
    // value 1: doubled midrank 2p+t+1 = 4 (x2 for a) -> r2_a = 8; u2_a = 2 (U_a = 1)
    assert((t.getLong(2), t.getLong(3)) == ((8L, 2L)))
  }

  test("ks/mwu deterministic under repartition") {
    val rows = (0 until 500).map(i =>
      (Seq("a", "b", "c")(i % 3), (i % 29).toLong, (i % 13) + 0.25,
        s"2024-01-01 00:00:00"))
    val base = ev(rows)
    def both(df: org.apache.spark.sql.DataFrame) = Seq(
      Stats.ksTest(df, "a", "b").collect().toSeq,
      Stats.mannWhitneyU(df, "a", "b").collect().toSeq)
    assert(both(base) == both(base.repartition(11)))
  }

  test("wilson bounds: bracket the point estimate, clamp sanely at k=0") {
    val rows = (0 until 40).map { i =>
      val t = if (i % 4 == 0 && i < 20) "error" else "view"
      (t, i.toLong, 1.0, if (i < 20) "2024-01-01 10:00:00" else "2024-01-01 11:00:00")
    }
    val out = Stats.wilsonErrorBounds(ev(rows)).collect()
    assert(out.length == 2)
    val h1 = out(0); val h2 = out(1)
    // hour 1: n=20, k=5 -> p=0.25 inside (lo, hi); hour 2: k=0 -> lo=0
    assert(h1.getAs[Long]("n") == 20L && h1.getAs[Long]("k") == 5L)
    assert(h1.getAs[Double]("wilson_lo") < 0.25 && 0.25 < h1.getAs[Double]("wilson_hi"))
    assert(h1.getAs[Double]("wilson_lo") > 0.0 && h1.getAs[Double]("wilson_hi") < 1.0)
    assert(h2.getAs[Long]("k") == 0L && h2.getAs[Double]("wilson_lo") == 0.0)
    assert(h2.getAs[Double]("wilson_hi") > 0.0)
  }

  test("benford: hand-checked digit counts, zero-filled grid, literal expectations") {
    val rows = Seq.fill(3)(("a", 1L, 1.0, "2024-01-01 00:00:00")) ++  // 100 cents -> digit 1
      Seq(("a", 1L, 2.5, "2024-01-01 00:00:00"))                       // 250 cents -> digit 2
    val out = Stats.benfordProfile(ev(rows)).collect()
    assert(out.length == 9)
    val d1 = out(0); val d2 = out(1); val d9 = out(8)
    assert(d1.getAs[Long]("n_d") == 3L && d1.getAs[Long]("observed_ppb") == 750000000L)
    assert(d1.getAs[Long]("benford_ppb") == 301029995L)
    assert(d1.getAs[Long]("dev_ppb") == 750000000L - 301029995L)
    assert(d2.getAs[Long]("n_d") == 1L && d2.getAs[Long]("observed_ppb") == 250000000L)
    assert(d9.getAs[Long]("n_d") == 0L && d9.getAs[Long]("observed_ppb") == 0L)
  }

}
