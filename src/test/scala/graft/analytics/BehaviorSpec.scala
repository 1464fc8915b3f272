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
}
